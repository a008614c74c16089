// Shim: adds the to_mdspan() API (absent from the old vendored mdarray)
// on top of std::experimental::mdarray, in the Kokkos::Experimental
// namespace the reference expects.
#pragma once
#include "mdspan.hpp"
#include <experimental/mdarray>
#include <vector>
namespace Kokkos { namespace Experimental {
template <class T, class Ext, class Layout = ::Kokkos::layout_right,
          class Container = std::vector<T>>
struct mdarray : std::experimental::mdarray<T, Ext, Layout, Container> {
  using base_t = std::experimental::mdarray<T, Ext, Layout, Container>;
  using base_t::base_t;
  mdarray() = default;
  mdarray(const mdarray&) = default;
  mdarray(mdarray&&) = default;
  // The old vendored mdarray's layout mapping is not assignable, which
  // implicitly deletes assignment; the reference assigns mdarrays (e.g.
  // uniform_partitioned_convolver::filter). Reconstruct in place instead.
  mdarray& operator=(const mdarray& o) {
    if (this != &o) { this->~mdarray(); new (this) mdarray(o); }
    return *this;
  }
  mdarray& operator=(mdarray&& o) noexcept {
    if (this != &o) { this->~mdarray(); new (this) mdarray(std::move(o)); }
    return *this;
  }
  using mdspan_type = ::Kokkos::mdspan<T, Ext, Layout>;
  using const_mdspan_type = ::Kokkos::mdspan<const T, Ext, Layout>;
  constexpr mdspan_type to_mdspan() noexcept {
    return mdspan_type(this->data(), this->mapping());
  }
  constexpr const_mdspan_type to_mdspan() const noexcept {
    return const_mdspan_type(this->data(), this->mapping());
  }
};
}}  // namespace Kokkos::Experimental
