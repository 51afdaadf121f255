// Ordered-container shim: boost::unordered_map backed by std::map.
//
// Purpose (golden-generation build only): the reference's output order —
// cluster numbering, row order — is an artifact of boost::unordered_map
// iteration order.  Backing the same sources with ordered maps makes the
// reference binaries emit the canonical deterministic order our framework
// defines (see DESIGN.md "Determinism contract") while leaving every
// algorithmic decision untouched.  Keys used by the reference all have
// operator<.
#ifndef DEFUSE_SHIM_UNORDERED_MAP_HPP
#define DEFUSE_SHIM_UNORDERED_MAP_HPP

#include <map>
#include <cstddef>
#include <string>

namespace boost {

template <typename K, typename V>
class unordered_map : public std::map<K, V> {};

template <typename T>
inline void hash_combine(std::size_t& seed, const T& v) {
    seed ^= static_cast<std::size_t>(v) + 0x9e3779b9 + (seed << 6) + (seed >> 2);
}

}  // namespace boost

#endif
