// Minimal boost::lexical_cast shim for the golden-generation build of the
// reference sources (test tooling only — not part of the framework).
// Matches the subset of boost semantics the reference uses: string<->number
// conversion via iostreams, throwing bad_lexical_cast (wrapped in the
// exception_detail types the reference's catch clauses name) on failure.
#ifndef DEFUSE_SHIM_LEXICAL_CAST_HPP
#define DEFUSE_SHIM_LEXICAL_CAST_HPP

#include <sstream>
#include <string>
#include <stdexcept>
// the real boost headers drag these in transitively; the reference sources
// rely on that
#include <cmath>
#include <cstdlib>
#include <cstring>
#include <algorithm>

namespace boost {

class bad_lexical_cast : public std::bad_cast {
public:
    const char* what() const throw() { return "bad lexical cast"; }
};

namespace exception_detail {
template <class E> struct error_info_injector : public E {};
template <class E> struct clone_impl : public E {};
}  // namespace exception_detail

typedef exception_detail::clone_impl<
    exception_detail::error_info_injector<bad_lexical_cast> >
    thrown_bad_lexical_cast;

template <typename Target, typename Source>
Target lexical_cast(const Source& arg) {
    std::stringstream ss;
    ss << arg;
    Target result;
    if (!(ss >> result) || !(ss >> std::ws).eof()) {
        throw thrown_bad_lexical_cast();
    }
    return result;
}

// string targets: identity-ish conversions
template <>
inline std::string lexical_cast<std::string, std::string>(const std::string& arg) {
    return arg;
}

// bool source "0"/"1" (used for revComp flags)
template <>
inline bool lexical_cast<bool, std::string>(const std::string& arg) {
    if (arg == "0") return false;
    if (arg == "1") return true;
    throw thrown_bad_lexical_cast();
}

}  // namespace boost

#endif
