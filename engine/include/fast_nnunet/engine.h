// FastnnUNet::Engine — native inference driver (capability parity with the
// reference's proprietary TensorRT engine, ref engine/fast_nnunet.cpp:17-27 and
// docs/Engine.md:41-61: set_config(ini) -> set_workspace(dir) -> infer(...)).
//
// TPU-native architecture: the device compute (the jitted sliding-window
// executable) lives in the serving daemon that owns the TPU (XLA is a
// single-owner runtime, unlike a CUDA context that any process can attach to).
// This engine is the native host runtime around it: NIfTI/config I/O, CT
// preprocessing, trilinear resampling, tile-grid planning, gaussian-weighted
// accumulation, argmax and geometry-exact mask export. Per-volume it makes ONE
// call into a Backend:
//   - HttpBackend: POST the preprocessed volume to the fast-inference REST API
//     (fast_nnunet_tpu.fast_inference.rest_api) running on the TPU host
//   - some Backend implementations can run in-process (e.g. a PJRT-loaded
//     StableHLO artifact) — the interface is one virtual call
//   - NullBackend: zero logits, for pipeline testing without a device
#pragma once

#include <array>
#include <functional>
#include <memory>
#include <string>
#include <vector>

#include "fast_nnunet/config.h"
#include "fast_nnunet/nifti_io.h"

namespace fast_nnunet {

// Logits for a whole preprocessed volume: (num_class, nx, ny, nz), class-major,
// x fastest within a class.
struct Logits {
    std::vector<float> data;
    std::array<int64_t, 3> shape{0, 0, 0};
    int num_class = 0;
};

class Backend {
  public:
    virtual ~Backend() = default;
    // preprocessed: (nx, ny, nz) x fastest; returns per-class logits
    virtual Logits infer_volume(const std::vector<float>& preprocessed,
                                const std::array<int64_t, 3>& shape,
                                const EngineConfig& cfg) = 0;
};

std::unique_ptr<Backend> make_null_backend();
std::unique_ptr<Backend> make_http_backend(const std::string& host, int port);
// In-process PJRT runtime: dlopen a PJRT plugin (libtpu.so on a TPU host; the
// pyshim in tests), compile the exported StableHLO module (model_pjrt.mlir,
// weights baked in), drive the sliding window from C++ — no daemon.
// bf16_input must match the dtype the artifact was exported with.
std::unique_ptr<Backend> make_pjrt_backend(const std::string& plugin_path,
                                           const std::string& artifact_path,
                                           bool bf16_input = true);

namespace FastnnUNet {

class Engine {
  public:
    void set_config(const std::string& ini_path);
    void set_workspace(const std::string& dir, bool verbose = false,
                       bool keep_intermediates = false);
    void set_backend(std::unique_ptr<Backend> backend);

    // Full pipeline: resample to target spacing -> clip+normalize -> backend
    // inference -> argmax -> resample mask back -> original-geometry result.
    std::vector<uint8_t> infer(const Volume& raw, bool use_sliding_window = true,
                               bool use_mirroring = false,
                               bool use_gaussian = true);

    const EngineConfig& config() const { return config_; }

  private:
    EngineConfig config_;
    std::string workspace_;
    bool verbose_ = false;
    std::unique_ptr<Backend> backend_;
};

}  // namespace FastnnUNet

// host-side numerics shared with tests
std::vector<float> resample_trilinear(const std::vector<float>& src,
                                      const std::array<int64_t, 3>& in_shape,
                                      const std::array<int64_t, 3>& out_shape);
std::vector<uint8_t> resample_mask_nearest(const std::vector<uint8_t>& src,
                                           const std::array<int64_t, 3>& in_shape,
                                           const std::array<int64_t, 3>& out_shape);

}  // namespace fast_nnunet
