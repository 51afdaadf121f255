// Minimal boost::algorithm::string shim (split / is_any_of) for the
// golden-generation build.  Matches boost::split's semantics for
// token_compress_off: adjacent delimiters produce empty tokens, and an
// empty input produces a single empty token.
#ifndef DEFUSE_SHIM_ALGORITHM_STRING_HPP
#define DEFUSE_SHIM_ALGORITHM_STRING_HPP

#include <string>
#include <vector>
#include <algorithm>

namespace boost {

class is_any_of_pred {
public:
    explicit is_any_of_pred(const std::string& chars) : mChars(chars) {}
    bool operator()(char c) const {
        return mChars.find(c) != std::string::npos;
    }
private:
    std::string mChars;
};

inline is_any_of_pred is_any_of(const std::string& chars) {
    return is_any_of_pred(chars);
}

template <typename SequenceT, typename PredicateT>
SequenceT& split(SequenceT& result, const std::string& input,
                 PredicateT pred) {
    result.clear();
    std::string token;
    for (std::string::size_type i = 0; i < input.size(); i++) {
        if (pred(input[i])) {
            result.push_back(token);
            token.clear();
        } else {
            token += input[i];
        }
    }
    result.push_back(token);
    return result;
}

}  // namespace boost

#endif
