// Minimal native test suite (no framework): exercises INI parsing, NIfTI
// round-trip, resampling and the null-backend pipeline.
#include <cassert>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <filesystem>
#include <fstream>
#include <iostream>

#include "fast_nnunet/engine.h"

using namespace fast_nnunet;

static int failures = 0;
#define CHECK(cond)                                                     \
    do {                                                                \
        if (!(cond)) {                                                  \
            std::cerr << "FAIL " << __FILE__ << ":" << __LINE__ << " "  \
                      << #cond << "\n";                                 \
            ++failures;                                                 \
        }                                                               \
    } while (0)

static void test_ini() {
    const char* path = "/tmp/fnnt_engine_test.ini";
    std::ofstream f(path);
    f << "[model]\nfile_name=m.stablehlo\nnum_class=61\n"
      << "[input]\npatch_size=160x96x96\ntarget_spacing=(2.0, 0.9765625, 0.9765625)\n"
      << "[preprocessing]\nmean=418.68\nstd=412.19\nlower_bound=-60\nupper_bound=3068\n"
      << "[inference]\nuse_mirroring=false\nstep_size=0.5\nuse_gaussian=true\n";
    f.close();
    EngineConfig c = EngineConfig::from_ini(path);
    CHECK(c.num_class == 61);
    CHECK(c.patch_size[0] == 160 && c.patch_size[2] == 96);
    CHECK(std::abs(c.target_spacing[0] - 2.0f) < 1e-6);
    CHECK(std::abs(c.mean - 418.68f) < 1e-3);
    CHECK(!c.use_mirroring && c.use_gaussian);
    CHECK(std::abs(c.step_size - 0.5f) < 1e-6);
}

static void test_nifti_roundtrip() {
    Volume v;
    v.shape = {4, 5, 6};
    v.spacing = {1.f, 2.f, 3.f};
    v.data.resize(v.voxels());
    for (int64_t i = 0; i < v.voxels(); ++i) v.data[i] = static_cast<float>(i % 7);
    v.header.assign(348, 0);
    // craft a minimal valid header
    int32_t sz = 348;
    std::memcpy(v.header.data(), &sz, 4);
    int16_t dim[8] = {3, 4, 5, 6, 1, 1, 1, 1};
    std::memcpy(v.header.data() + 40, dim, sizeof(dim));
    float pixdim[8] = {1.f, 1.f, 2.f, 3.f, 1.f, 1.f, 1.f, 1.f};
    std::memcpy(v.header.data() + 76, pixdim, sizeof(pixdim));
    std::memcpy(v.header.data() + 344, "n+1\0", 4);

    std::vector<uint8_t> mask(v.voxels());
    for (size_t i = 0; i < mask.size(); ++i) mask[i] = i % 3;
    Tools::save_mask(mask, v, "/tmp/fnnt_engine_mask.nii.gz");
    Volume back = Data::LoadData("/tmp/fnnt_engine_mask.nii.gz");
    CHECK(back.shape == v.shape);
    CHECK(std::abs(back.spacing[1] - 2.f) < 1e-6);
    bool ok = true;
    for (int64_t i = 0; i < back.voxels(); ++i)
        ok &= back.data[i] == static_cast<float>(mask[i]);
    CHECK(ok);
}

static void test_resample() {
    std::vector<float> src = {0, 1, 2, 3, 4, 5, 6, 7};  // 2x2x2
    auto out = resample_trilinear(src, {2, 2, 2}, {4, 4, 4});
    CHECK(out.size() == 64);
    // corners preserved (nearest-edge clamping)
    CHECK(std::abs(out[0] - 0.f) < 1e-5);
    CHECK(std::abs(out[63] - 7.f) < 1e-5);
    // identity resample
    auto same = resample_trilinear(src, {2, 2, 2}, {2, 2, 2});
    for (int i = 0; i < 8; ++i) CHECK(std::abs(same[i] - src[i]) < 1e-6);

    std::vector<uint8_t> m = {0, 1, 2, 3, 4, 5, 6, 7};
    auto mn = resample_mask_nearest(m, {2, 2, 2}, {4, 4, 4});
    CHECK(mn[0] == 0 && mn[63] == 7);
}

static void test_null_pipeline() {
    const char* ini = "/tmp/fnnt_engine_null.ini";
    std::ofstream f(ini);
    f << "[model]\nnum_class=3\n[input]\npatch_size=8x8x8\n"
      << "target_spacing=(1.0,1.0,1.0)\n[preprocessing]\nmean=0\nstd=1\n"
      << "lower_bound=-100\nupper_bound=100\n";
    f.close();
    FastnnUNet::Engine engine;
    engine.set_config(ini);
    Volume v;
    v.shape = {10, 12, 14};
    v.spacing = {2.f, 1.f, 1.f};
    v.data.assign(v.voxels(), 42.f);
    v.header.assign(348, 0);
    auto mask = engine.infer(v);
    CHECK(static_cast<int64_t>(mask.size()) == v.voxels());
    bool all_bg = true;
    for (auto m : mask) all_bg &= (m == 0);
    CHECK(all_bg);
}

// ------------------------------------------------------------------- DICOM
namespace {
void put16(std::vector<uint8_t>& b, uint16_t v) {
    b.push_back(v & 0xff);
    b.push_back(v >> 8);
}
void put32(std::vector<uint8_t>& b, uint32_t v) {
    put16(b, v & 0xffff);
    put16(b, v >> 16);
}
void el_explicit(std::vector<uint8_t>& b, uint16_t g, uint16_t e,
                 const char* vr, const std::string& val) {
    std::string v = val;
    if (v.size() % 2) v.push_back('\0');
    put16(b, g);
    put16(b, e);
    b.push_back(vr[0]);
    b.push_back(vr[1]);
    bool long_vr = std::strncmp(vr, "OW", 2) == 0 ||
                   std::strncmp(vr, "OB", 2) == 0;
    if (long_vr) {
        put16(b, 0);
        put32(b, uint32_t(v.size()));
    } else {
        put16(b, uint16_t(v.size()));
    }
    b.insert(b.end(), v.begin(), v.end());
}
void write_dicom_slice(const std::string& path, int z, int rows, int cols,
                       const std::vector<int16_t>& px) {
    std::vector<uint8_t> b(128, 0);
    b.insert(b.end(), {'D', 'I', 'C', 'M'});
    el_explicit(b, 0x0002, 0x0010, "UI", "1.2.840.10008.1.2.1");
    el_explicit(b, 0x0018, 0x0050, "DS", "2.5");
    el_explicit(b, 0x0020, 0x0013, "IS", std::to_string(z + 1));
    el_explicit(b, 0x0020, 0x0032, "DS",
                "-100\\-120\\" + std::to_string(z * 2.5));
    el_explicit(b, 0x0020, 0x0037, "DS", "1\\0\\0\\0\\1\\0");
    std::string us(2, '\0');
    auto set_us = [&](uint16_t v) {
        us[0] = char(v & 0xff);
        us[1] = char(v >> 8);
        return us;
    };
    el_explicit(b, 0x0028, 0x0010, "US", set_us(uint16_t(rows)));
    el_explicit(b, 0x0028, 0x0011, "US", set_us(uint16_t(cols)));
    el_explicit(b, 0x0028, 0x0030, "DS", "0.75\\0.5");
    el_explicit(b, 0x0028, 0x0100, "US", set_us(16));
    el_explicit(b, 0x0028, 0x0103, "US", set_us(1));
    el_explicit(b, 0x0028, 0x1052, "DS", "-1024");
    el_explicit(b, 0x0028, 0x1053, "DS", "2");
    std::string pd(reinterpret_cast<const char*>(px.data()), px.size() * 2);
    el_explicit(b, 0x7FE0, 0x0010, "OW", pd);
    std::ofstream f(path, std::ios::binary);
    f.write(reinterpret_cast<const char*>(b.data()), b.size());
}
}  // namespace

static void test_dicom_series() {
    std::string dir = "/tmp/fnnt_engine_dicom";
    std::filesystem::create_directories(dir);
    const int rows = 6, cols = 4, nz = 3;
    // write in shuffled z order so position sorting is exercised
    for (int z : {2, 0, 1}) {
        std::vector<int16_t> px(rows * cols);
        for (int i = 0; i < rows * cols; ++i)
            px[i] = int16_t(z * 100 + i);
        write_dicom_slice(dir + "/s" + std::to_string(2 - z) + ".dcm", z,
                          rows, cols, px);
    }
    CHECK(Data::looks_like_dicom(dir));
    Volume v = Data::LoadData(dir);
    CHECK(v.shape[0] == cols && v.shape[1] == rows && v.shape[2] == nz);
    CHECK(std::abs(v.spacing[0] - 0.5f) < 1e-6);   // col spacing -> x
    CHECK(std::abs(v.spacing[1] - 0.75f) < 1e-6);  // row spacing -> y
    CHECK(std::abs(v.spacing[2] - 2.5f) < 1e-6);   // slice distance -> z
    // HU rescale: raw*2 - 1024, sorted ascending in z despite shuffled files
    CHECK(std::abs(v.at(0, 0, 0) - (0 * 2 - 1024)) < 1e-4);
    CHECK(std::abs(v.at(1, 0, 2) - ((200 + 1) * 2 - 1024)) < 1e-4);
    CHECK(std::abs(v.at(0, 1, 1) - ((100 + cols) * 2 - 1024)) < 1e-4);
    // DICOM-loaded volumes can be written back (synthesized NIfTI header)
    std::vector<uint8_t> mask(v.voxels(), 1);
    Tools::save_mask(mask, v, "/tmp/fnnt_engine_dicom_mask.nii.gz");
    Volume back = Data::LoadData("/tmp/fnnt_engine_dicom_mask.nii.gz");
    CHECK(back.shape == v.shape);
    CHECK(std::abs(back.spacing[2] - 2.5f) < 1e-6);
}

int main() {
    test_ini();
    test_nifti_roundtrip();
    test_resample();
    test_null_pipeline();
    test_dicom_series();
    if (failures == 0) {
        std::cout << "engine tests: all OK\n";
        return 0;
    }
    std::cerr << failures << " failures\n";
    return 1;
}
