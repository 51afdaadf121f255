// Ordered-container shim: boost::unordered_set backed by std::set.
// See unordered_map.hpp for rationale.
#ifndef DEFUSE_SHIM_UNORDERED_SET_HPP
#define DEFUSE_SHIM_UNORDERED_SET_HPP

#include <set>

namespace boost {

template <typename K>
class unordered_set : public std::set<K> {};

}  // namespace boost

#endif
