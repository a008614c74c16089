// Minimal .npy v1.0 reader/writer for the golden-vector generator.
// Supports little-endian '<f4', '<f8', '<c8' C-order arrays, rank 1-3.
#pragma once

#include <complex>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <stdexcept>
#include <string>
#include <vector>

namespace npy {

struct Array {
    std::string dtype;  // "<f4" | "<f8" | "<c8"
    std::vector<std::size_t> shape;
    std::vector<char> data;

    [[nodiscard]] std::size_t count() const {
        std::size_t n = 1;
        for (auto s : shape) n *= s;
        return n;
    }
    [[nodiscard]] const float* f32() const { return reinterpret_cast<const float*>(data.data()); }
    [[nodiscard]] const double* f64() const { return reinterpret_cast<const double*>(data.data()); }
    [[nodiscard]] const std::complex<float>* c64() const {
        return reinterpret_cast<const std::complex<float>*>(data.data());
    }
};

inline Array load(const std::string& path) {
    std::ifstream f(path, std::ios::binary);
    if (!f) throw std::runtime_error("cannot open " + path);
    char magic[6];
    f.read(magic, 6);
    if (std::memcmp(magic, "\x93NUMPY", 6) != 0) throw std::runtime_error("bad magic: " + path);
    char ver[2];
    f.read(ver, 2);
    std::uint16_t hlen = 0;
    f.read(reinterpret_cast<char*>(&hlen), 2);
    std::string header(hlen, '\0');
    f.read(header.data(), hlen);

    Array a;
    auto dpos = header.find("'descr':");
    auto q1 = header.find('\'', dpos + 8);
    auto q2 = header.find('\'', q1 + 1);
    a.dtype = header.substr(q1 + 1, q2 - q1 - 1);
    if (header.find("'fortran_order': False") == std::string::npos)
        throw std::runtime_error("fortran order unsupported: " + path);
    auto spos = header.find("'shape':");
    auto p1 = header.find('(', spos);
    auto p2 = header.find(')', p1);
    std::string dims = header.substr(p1 + 1, p2 - p1 - 1);
    std::size_t pos = 0;
    while (pos < dims.size()) {
        while (pos < dims.size() && (dims[pos] == ' ' || dims[pos] == ',')) ++pos;
        if (pos >= dims.size()) break;
        a.shape.push_back(std::stoul(dims.substr(pos)));
        while (pos < dims.size() && dims[pos] != ',') ++pos;
    }
    std::size_t isize = (a.dtype == "<f8") ? 8 : (a.dtype == "<c8") ? 8 : (a.dtype == "<c16") ? 16 : 4;
    a.data.resize(a.count() * isize);
    f.read(a.data.data(), static_cast<std::streamsize>(a.data.size()));
    if (!f) throw std::runtime_error("short read: " + path);
    return a;
}

inline void save(const std::string& path, const std::string& dtype,
                 const std::vector<std::size_t>& shape, const void* data, std::size_t nbytes) {
    std::string shp = "(";
    for (std::size_t i = 0; i < shape.size(); ++i) shp += std::to_string(shape[i]) + ", ";
    shp += ")";
    std::string header =
        "{'descr': '" + dtype + "', 'fortran_order': False, 'shape': " + shp + ", }";
    std::size_t total = 10 + header.size() + 1;
    std::size_t pad = (64 - total % 64) % 64;
    header += std::string(pad, ' ');
    header += '\n';

    std::ofstream f(path, std::ios::binary);
    f.write("\x93NUMPY\x01\x00", 8);
    auto hlen = static_cast<std::uint16_t>(header.size());
    f.write(reinterpret_cast<const char*>(&hlen), 2);
    f.write(header.data(), static_cast<std::streamsize>(header.size()));
    f.write(static_cast<const char*>(data), static_cast<std::streamsize>(nbytes));
}

template <typename T>
inline void save(const std::string& path, const std::string& dtype,
                 const std::vector<std::size_t>& shape, const std::vector<T>& v) {
    save(path, dtype, shape, v.data(), v.size() * sizeof(T));
}

}  // namespace npy
