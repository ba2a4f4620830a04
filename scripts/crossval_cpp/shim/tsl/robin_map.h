// tsl::robin_map stand-in — see robin_set.h.
#pragma once
#include <unordered_map>

namespace tsl {
template <typename Key, typename T, typename... Rest>
using robin_map = std::unordered_map<Key, T>;
}  // namespace tsl
