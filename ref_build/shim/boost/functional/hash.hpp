// Shim: hash_combine lives in unordered_map.hpp; this header exists only
// to satisfy the include.
#ifndef DEFUSE_SHIM_FUNCTIONAL_HASH_HPP
#define DEFUSE_SHIM_FUNCTIONAL_HASH_HPP
#include <boost/unordered_map.hpp>
#endif
