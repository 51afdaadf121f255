// Minimal boost::bimap<vector_of<L>, multiset_of<R>> emulation for the
// golden-generation build of setcover.cpp.  Supports exactly the API the
// reference uses: push_back, size, right.rbegin() (largest right value),
// left.begin() + idx random access, and left.replace_data.
//
// Tie-break contract: among entries sharing the maximal right value (the
// cluster size), right.rbegin() yields the SMALLEST left value (cluster
// index).  The real boost multiset view's tie order is an internal
// artifact; this canonical order is the one our framework's set cover
// implements (DESIGN.md "Determinism contract" item 3).
#ifndef DEFUSE_SHIM_BIMAP_HPP
#define DEFUSE_SHIM_BIMAP_HPP

#include <set>
#include <utility>
#include <vector>
#include <cstddef>

namespace boost {
namespace bimaps {

template <typename T> struct vector_of { typedef T value_type; };
template <typename T> struct multiset_of { typedef T value_type; };

template <typename LeftSpec, typename RightSpec>
class bimap {
public:
    typedef typename LeftSpec::value_type left_value;
    typedef typename RightSpec::value_type right_value;

    struct value_type {
        value_type(left_value l, right_value r) : left(l), right(r) {}
        left_value left;
        right_value right;
    };

    // Pair exposed by view iterators: first = view-side key.
    struct left_pair {
        left_value first;    // left value (cluster index)
        right_value second;  // right value (size)
    };
    struct right_pair {
        right_value first;  // right value (size)
        left_value second;  // left value (cluster index)
    };

    class left_iterator {
    public:
        left_iterator(bimap* owner, std::size_t idx)
            : mOwner(owner), mIdx(idx) {}
        left_iterator operator+(std::ptrdiff_t n) const {
            return left_iterator(mOwner, mIdx + n);
        }
        const left_pair* operator->() const {
            mCache.first = static_cast<left_value>(mIdx);
            mCache.second = mOwner->mRights[mIdx];
            return &mCache;
        }
        std::size_t index() const { return mIdx; }
    private:
        friend class bimap;
        bimap* mOwner;
        std::size_t mIdx;
        mutable left_pair mCache;
    };

    class left_view {
    public:
        explicit left_view(bimap* owner) : mOwner(owner) {}
        left_iterator begin() { return left_iterator(mOwner, 0); }
        bool replace_data(left_iterator iter, right_value newValue) {
            return mOwner->replaceRight(iter.index(), newValue);
        }
    private:
        bimap* mOwner;
    };

    class right_reverse_iterator {
    public:
        explicit right_reverse_iterator(const right_pair& p) : mPair(p) {}
        const right_pair* operator->() const { return &mPair; }
    private:
        right_pair mPair;
    };

    class right_view {
    public:
        explicit right_view(bimap* owner) : mOwner(owner) {}
        right_reverse_iterator rbegin() const {
            // max size; ties -> smallest cluster index (stored as -index)
            typename OrderSet::const_reverse_iterator it =
                mOwner->mOrder.rbegin();
            right_pair p;
            p.first = it->first;
            p.second = static_cast<left_value>(-it->second);
            return right_reverse_iterator(p);
        }
    private:
        bimap* mOwner;
    };

    bimap() : left(this), right(this) {}

    void push_back(const value_type& v) {
        // left values are pushed densely (0, 1, 2, ...) by the reference
        mRights.push_back(v.right);
        mOrder.insert(std::make_pair(v.right, -static_cast<long>(v.left)));
    }

    std::size_t size() const { return mRights.size(); }

    left_view left;
    right_view right;

private:
    friend class left_view;
    friend class right_view;
    typedef std::set<std::pair<right_value, long> > OrderSet;

    bool replaceRight(std::size_t idx, right_value newValue) {
        mOrder.erase(std::make_pair(mRights[idx], -static_cast<long>(idx)));
        mRights[idx] = newValue;
        mOrder.insert(std::make_pair(newValue, -static_cast<long>(idx)));
        return true;
    }

    std::vector<right_value> mRights;
    OrderSet mOrder;
};

}  // namespace bimaps

using bimaps::bimap;

}  // namespace boost

#endif
