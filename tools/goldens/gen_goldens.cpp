// Golden-vector generator: drives the ACTUAL reference library
// (/root/reference, header-only, fallback plans only — no vendor deps)
// on the seeded fixtures written by gen_inputs.py and dumps its outputs
// as .npy files. These are the parity oracles for
// tests/test_reference_parity.py (north-star metric #2: SNR vs the C++
// reference within its documented bounds, allclose.hpp:36-40).
//
// Build/run: tools/goldens/run.sh  (requires /root/reference mounted).

#include <neo/convolution.hpp>
#include <neo/fft.hpp>

#include "npy.hpp"

#include <complex>
#include <cstdio>
#include <string>
#include <vector>

namespace fft = neo::fft;
namespace conv = neo::convolution;

static std::string g_dir;

static npy::Array in(const std::string& name) { return npy::load(g_dir + "/" + name); }

static void save_c64(const std::string& name, const std::vector<std::size_t>& shape,
                     const std::vector<std::complex<float>>& v) {
    npy::save(g_dir + "/" + name, "<c8", shape, v.data(), v.size() * sizeof(v[0]));
}

static void save_f32(const std::string& name, const std::vector<std::size_t>& shape,
                     const std::vector<float>& v) {
    npy::save(g_dir + "/" + name, "<f4", shape, v);
}

template <typename T>
static auto as_vec_mdspan(std::vector<T>& v) {
    return Kokkos::mdspan<T, Kokkos::dextents<std::size_t, 1>>{v.data(), v.size()};
}

// ---------------------------------------------------------------- FFT family

static void gen_fft() {
    for (int n : {16, 256, 1024}) {
        auto x = in("in_cnoise_" + std::to_string(n) + ".npy");
        std::vector<std::complex<float>> buf(x.c64(), x.c64() + n);
        auto plan = fft::c2c_dit2_plan<std::complex<float>>{fft::from_order, fft::next_order(n)};
        fft::fft(plan, as_vec_mdspan(buf));
        save_c64("ref_fft_" + std::to_string(n) + ".npy", {static_cast<std::size_t>(n)}, buf);
    }
    {
        auto x = in("in_cnoise_1024_f64.npy");
        auto* p = reinterpret_cast<const std::complex<double>*>(x.data.data());
        std::vector<std::complex<double>> buf(p, p + 1024);
        auto plan = fft::c2c_dit2_plan<std::complex<double>>{fft::from_order, 10};
        fft::fft(plan, as_vec_mdspan(buf));
        npy::save(g_dir + "/ref_fft_1024_f64.npy", "<c16", {1024},
                  buf.data(), buf.size() * sizeof(buf[0]));
    }
    for (int n : {16, 256, 1024}) {
        auto x = in("in_rnoise_" + std::to_string(n) + ".npy");
        std::vector<float> re(x.f32(), x.f32() + n);
        std::vector<std::complex<float>> out(static_cast<std::size_t>(n) / 2 + 1);
        auto plan = fft::fallback_rfft_plan<float>{fft::from_order, fft::next_order(n)};
        plan(as_vec_mdspan(re), as_vec_mdspan(out));
        save_c64("ref_rfft_" + std::to_string(n) + ".npy", {out.size()}, out);
    }
    // Bluestein chirp-z DFT, arbitrary (non pow-2) sizes, unnormalized.
    for (int n : {17, 100}) {
        auto x = in("in_cnoise_1024.npy");
        std::vector<std::complex<float>> buf(x.c64(), x.c64() + n);
        auto plan = fft::fallback_dft_plan<std::complex<float>>{static_cast<std::size_t>(n)};
        plan(as_vec_mdspan(buf), fft::direction::forward);
        save_c64("ref_dft_" + std::to_string(n) + ".npy", {static_cast<std::size_t>(n)}, buf);
    }
    {
        auto x = in("in_rnoise_256.npy");
        std::vector<float> buf(x.f32(), x.f32() + 64);
        auto plan = fft::fallback_dct2_plan<float>{fft::from_order, 6};
        plan(as_vec_mdspan(buf));
        save_f32("ref_dct2_64.npy", {64}, buf);
    }
    {
        // STFT with 50% overlap + default Hann window.
        auto sigf = in("in_sig.npy");
        auto sig = Kokkos::mdspan<const float, Kokkos::dextents<std::size_t, 2>>{
            sigf.f32(), sigf.shape[0], sigf.shape[1]};
        auto result = fft::stft(sig, fft::stft_options<float>{
                                         .frame_size = 256,
                                         .transform_size = 256,
                                         .overlap_size = 128,
                                     });
        std::vector<std::complex<float>> flat(result.data(), result.data() + result.size());
        save_c64("ref_stft_256_128.npy",
                 {result.extent(0), result.extent(1), result.extent(2)}, flat);
    }
}

// ------------------------------------------------------------- convolution

static void gen_conv_oneshot() {
    auto a = in("in_a64.npy");
    auto b = in("in_b33.npy");
    auto av = Kokkos::mdspan<const float, Kokkos::dextents<std::size_t, 1>>{a.f32(), 64};
    auto bv = Kokkos::mdspan<const float, Kokkos::dextents<std::size_t, 1>>{b.f32(), 33};
    {
        auto out = conv::fft_convolve(av, bv);
        std::vector<float> v(out.data(), out.data() + out.size());
        save_f32("ref_fftconv.npy", {v.size()}, v);
    }
    {
        auto out = conv::direct_convolve(av, bv);
        std::vector<float> v(out.data(), out.data() + out.size());
        save_f32("ref_directconv.npy", {v.size()}, v);
    }
}

// Streams [C, T] through one reference convolver per channel (the CLI's
// per-channel-serial pattern, extra/cli/src/convolver.cpp:37-55).
template <typename Convolver>
static std::vector<float> stream(const npy::Array& sig, const npy::Array& ir,
                                 std::size_t block, float sig_scale) {
    auto irv = Kokkos::mdspan<const float, Kokkos::dextents<std::size_t, 2>>{
        ir.f32(), ir.shape[0], ir.shape[1]};
    auto parts = conv::uniform_partition(irv, block);  // [C, P, B+1]

    const std::size_t channels = sig.shape[0];
    const std::size_t total = sig.shape[1];
    std::vector<float> out(channels * total);
    for (std::size_t ch = 0; ch < channels; ++ch) {
        auto convolver = Convolver{};
        auto filter = Kokkos::submdspan(parts.to_mdspan(), ch, Kokkos::full_extent,
                                        Kokkos::full_extent);
        convolver.filter(filter);
        for (std::size_t off = 0; off + block <= total; off += block) {
            std::vector<float> blk(block);
            for (std::size_t i = 0; i < block; ++i)
                blk[i] = sig.f32()[ch * total + off + i] * sig_scale;
            convolver(as_vec_mdspan(blk));
            for (std::size_t i = 0; i < block; ++i) out[ch * total + off + i] = blk[i];
        }
    }
    return out;
}

// Raw OLS/OLA block processors (overlap_save.hpp:85-112,
// overlap_add.hpp:78-108) with a bin-multiply callback: single-partition
// FFT filtering of in_rnoise_1024 by in_b33 at block 64
// (transform = bit_ceil(64+33-1) = 128).
template <typename Overlap>
static std::vector<float> stream_overlap(const npy::Array& sig, const npy::Array& flt,
                                         std::size_t block, std::size_t filter_len) {
    auto processor = Overlap{block, filter_len};
    const auto n = processor.transform_size();
    std::vector<std::complex<float>> fspec(n / 2 + 1);
    {
        std::vector<float> padded(n, 0.0F);
        for (std::size_t i = 0; i < filter_len; ++i) padded[i] = flt.f32()[i];
        auto plan = fft::fallback_rfft_plan<float>{fft::from_order, fft::next_order(n)};
        plan(as_vec_mdspan(padded), as_vec_mdspan(fspec));
    }
    const std::size_t total = sig.shape[0];
    std::vector<float> out(total);
    for (std::size_t off = 0; off + block <= total; off += block) {
        std::vector<float> blk(sig.f32() + off, sig.f32() + off + block);
        processor(as_vec_mdspan(blk), [&](auto spectrum) {
            for (std::size_t i = 0; i < fspec.size(); ++i)
                spectrum[i] = spectrum[i] * fspec[i];
        });
        for (std::size_t i = 0; i < block; ++i) out[off + i] = blk[i];
    }
    return out;
}

// Sparse-filter variant of stream(): forwards the sparsity predicate to
// sparse_filter::filter (sparse_convolver.hpp:16, csr_matrix.hpp:67-98).
template <typename Convolver, typename Predicate>
static std::vector<float> stream_sparse(const npy::Array& sig, const npy::Array& ir,
                                        std::size_t block, Predicate pred) {
    auto irv = Kokkos::mdspan<const float, Kokkos::dextents<std::size_t, 2>>{
        ir.f32(), ir.shape[0], ir.shape[1]};
    auto parts = conv::uniform_partition(irv, block);

    const std::size_t channels = sig.shape[0];
    const std::size_t total = sig.shape[1];
    std::vector<float> out(channels * total);
    for (std::size_t ch = 0; ch < channels; ++ch) {
        auto convolver = Convolver{};
        auto filter = Kokkos::submdspan(parts.to_mdspan(), ch, Kokkos::full_extent,
                                        Kokkos::full_extent);
        convolver.filter(filter, pred);
        for (std::size_t off = 0; off + block <= total; off += block) {
            std::vector<float> blk(block);
            for (std::size_t i = 0; i < block; ++i)
                blk[i] = sig.f32()[ch * total + off + i];
            convolver(as_vec_mdspan(blk));
            for (std::size_t i = 0; i < block; ++i) out[ch * total + off + i] = blk[i];
        }
    }
    return out;
}

static void gen_conv_streaming() {
    auto sig = in("in_sig.npy");
    auto ir = in("in_ir.npy");
    const std::size_t block = 128;
    using C = std::complex<float>;

    {
        auto out = stream<conv::upols_convolver<C>>(sig, ir, block, 1.0F);
        save_f32("ref_upols_b128.npy", {sig.shape[0], sig.shape[1]}, out);
    }
    {
        auto out = stream<conv::upola_convolver<C>>(sig, ir, block, 1.0F);
        save_f32("ref_upola_b128.npy", {sig.shape[0], sig.shape[1]}, out);
    }

    // Split-complex (SoA planes) convolver aliases (dense_convolver.hpp:32-39)
    {
        auto out = stream<conv::split_upols_convolver<C>>(sig, ir, block, 1.0F);
        save_f32("ref_split_upols_b128.npy", {sig.shape[0], sig.shape[1]}, out);
    }
    {
        auto out = stream<conv::split_upola_convolver<C>>(sig, ir, block, 1.0F);
        save_f32("ref_split_upola_b128.npy", {sig.shape[0], sig.shape[1]}, out);
    }

    // Sparse-filter convolver (sparse_convolver.hpp:16): keep every bin
    // whose index is not a multiple of 3 — index-based so the mask is
    // reproducible bit-exactly on both sides.
    {
        auto pred = [](auto /*row*/, auto col, auto /*value*/) { return (col % 3) != 0; };
        auto out = stream_sparse<conv::sparse_upols_convolver<C>>(sig, ir, block, pred);
        save_f32("ref_sparse_upols_b128.npy", {sig.shape[0], sig.shape[1]}, out);
    }

    // Raw OLS/OLA processors with a single-partition filter multiply.
    {
        auto x = in("in_rnoise_1024.npy");
        auto flt = in("in_b33.npy");
        auto out = stream_overlap<conv::overlap_save<C>>(x, flt, 64, 33);
        save_f32("ref_ols_b64_f33.npy", {out.size()}, out);
        auto out2 = stream_overlap<conv::overlap_add<C>>(x, flt, 64, 33);
        save_f32("ref_ola_b64_f33.npy", {out2.size()}, out2);
    }

    // Compressed (quantized) FDL variants. The reference quantizes at a
    // fixed full-scale of 1.0 (compressed_fdl.hpp:38-48), so the signal is
    // scaled down to keep frame spectra inside [-1, 1] like its own test
    // fixtures (compressed_fdl_test.cpp feeds values in [-1, 1]).
    using Overlap = conv::overlap_save<C>;
    using Filter = conv::dense_filter<C>;
    {
        using Fdl = conv::compressed_fdl<C, neo::scalar_complex<std::int8_t>>;
        auto out = stream<conv::uniform_partitioned_convolver<Overlap, Fdl, Filter>>(
            sig, ir, block, 1.0F / 64.0F);
        save_f32("ref_upols_int8_b128.npy", {sig.shape[0], sig.shape[1]}, out);
    }
    {
        using Fdl = conv::compressed_fdl<C, neo::scalar_complex<std::int16_t>>;
        auto out = stream<conv::uniform_partitioned_convolver<Overlap, Fdl, Filter>>(
            sig, ir, block, 1.0F / 64.0F);
        save_f32("ref_upols_int16_b128.npy", {sig.shape[0], sig.shape[1]}, out);
    }

    // Partitioned filter spectra themselves (uniform_partition oracle).
    auto irv = Kokkos::mdspan<const float, Kokkos::dextents<std::size_t, 2>>{
        ir.f32(), ir.shape[0], ir.shape[1]};
    auto parts = conv::uniform_partition(irv, block);
    std::vector<std::complex<float>> flat(parts.data(), parts.data() + parts.size());
    save_c64("ref_partition_b128.npy", {parts.extent(0), parts.extent(1), parts.extent(2)},
             flat);
}

int main(int argc, char** argv) {
    g_dir = argc > 1 ? argv[1] : "tests/goldens";
    gen_fft();
    gen_conv_oneshot();
    gen_conv_streaming();
    std::printf("goldens written to %s\n", g_dir.c_str());
    return 0;
}
