// tsl::robin_set stand-in (the robin-map submodule is an empty directory in
// this snapshot). Hash-set semantics are identical for the operations the
// reference uses (insert/find/count/erase/reserve/clear/iteration); only
// performance characteristics differ, which is irrelevant for validation.
#pragma once
#include <unordered_set>

namespace tsl {
template <typename Key, typename... Rest>
using robin_set = std::unordered_set<Key>;
}  // namespace tsl
