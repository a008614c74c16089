// Shim: the reference includes <mdspan/mdspan.hpp> expecting the Kokkos
// reference implementation (Kokkos:: namespace). This container has no
// network egress, so we adapt the mdspan implementation vendored inside
// the tensorflow/raft include tree (namespace std::experimental) instead.
#pragma once
#include <bit>       // the vendored aligned_accessor uses std::has_single_bit
#include <memory>    // ... and std::assume_aligned without including these
#include <experimental/mdspan>
namespace Kokkos {
using std::experimental::default_accessor;
using std::experimental::dextents;
using std::experimental::extents;
using std::experimental::full_extent;
using std::experimental::layout_left;
using std::experimental::layout_right;
using std::experimental::layout_stride;
using std::experimental::mdspan;
using std::experimental::submdspan;
using std::experimental::dynamic_extent;
}  // namespace Kokkos
