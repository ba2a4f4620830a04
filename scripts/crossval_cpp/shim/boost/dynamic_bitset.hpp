// Minimal stand-in for boost::dynamic_bitset, written from scratch for the
// cross-validation harness (this image has no Boost). Implements exactly the
// API subset the reference sources use: sized construction, resize, set,
// test, reset, size, and operator[]. Backed by std::vector<bool>.
#pragma once

#include <cstddef>
#include <vector>

namespace boost {

template <typename Block = unsigned long,
          typename Allocator = std::allocator<Block>>
class dynamic_bitset {
  public:
    dynamic_bitset() = default;
    explicit dynamic_bitset(std::size_t n, unsigned long /*value*/ = 0)
        : bits_(n, false) {}

    void resize(std::size_t n, bool value = false) { bits_.resize(n, value); }
    void reserve(std::size_t n) { bits_.reserve(n); }
    std::size_t size() const { return bits_.size(); }

    dynamic_bitset &set(std::size_t pos, bool value = true) {
        bits_[pos] = value;
        return *this;
    }
    dynamic_bitset &set() {
        bits_.assign(bits_.size(), true);
        return *this;
    }
    dynamic_bitset &reset(std::size_t pos) {
        bits_[pos] = false;
        return *this;
    }
    dynamic_bitset &reset() {
        bits_.assign(bits_.size(), false);
        return *this;
    }
    bool test(std::size_t pos) const { return bits_[pos]; }
    bool any() const {
        for (bool b : bits_)
            if (b) return true;
        return false;
    }
    bool none() const { return !any(); }
    std::size_t count() const {
        std::size_t c = 0;
        for (bool b : bits_) c += b;
        return c;
    }

    // vector<bool>'s proxy reference already supports read and assignment
    std::vector<bool>::reference operator[](std::size_t pos) {
        return bits_[pos];
    }
    bool operator[](std::size_t pos) const { return bits_[pos]; }

  private:
    std::vector<bool> bits_;
};

}  // namespace boost
