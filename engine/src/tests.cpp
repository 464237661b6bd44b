// Minimal native test suite (no framework): exercises INI parsing, NIfTI
// round-trip, resampling and the null-backend pipeline.
#include <cassert>
#include <cmath>
#include <cstdio>
#include <cstring>
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

int main() {
    test_ini();
    test_nifti_roundtrip();
    test_resample();
    test_null_pipeline();
    if (failures == 0) {
        std::cout << "engine tests: all OK\n";
        return 0;
    }
    std::cerr << failures << " failures\n";
    return 1;
}
