// The reference includes this header but never uses boost::container::set
// (verified by grep). Map it to the standard container so the include
// resolves without Boost.
#pragma once
#include <set>

namespace boost {
namespace container {
using std::set;
}  // namespace container
}  // namespace boost
