// In-process PJRT backend: loads the exported StableHLO artifact into any
// PJRT runtime plugin (libtpu.so on a TPU host, a CPU plugin, or the test
// shim) and runs the sliding-window inference natively — no Python daemon.
//
// This is the TPU analogue of the reference engine running TensorRT
// in-process (ref engine/fast_nnunet.cpp:17-27: initializer -> set_config ->
// infer with a .trt engine file): where TensorRT deserializes a .trt plan,
// we PJRT_Client_Compile the exported `model_pjrt.mlir` (StableHLO module
// bytecode, weights baked in by export/export_model.py) and drive the
// per-patch executable from C++. Tile-grid math and the gaussian importance
// map mirror ops/sliding_window.py bit-for-bit so masks match the Python
// predictor.
#include <dlfcn.h>

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <iostream>
#include <memory>
#include <sstream>
#include <stdexcept>
#include <string>
#include <vector>

#include "fast_nnunet/engine.h"
#include "pjrt_c_api.h"

namespace fast_nnunet {
namespace {

// ----------------------------------------------------------------- utilities
std::string read_file(const std::string& path) {
    std::ifstream f(path, std::ios::binary);
    if (!f) throw std::runtime_error("cannot open " + path);
    std::ostringstream ss;
    ss << f.rdbuf();
    return ss.str();
}

// fp32 -> bf16 with round-to-nearest-even (matches XLA's convert semantics)
inline uint16_t f32_to_bf16(float v) {
    uint32_t bits;
    std::memcpy(&bits, &v, 4);
    if ((bits & 0x7fffffff) > 0x7f800000) return uint16_t((bits >> 16) | 0x40);
    uint32_t lsb = (bits >> 16) & 1;
    return uint16_t((bits + 0x7fff + lsb) >> 16);
}

inline float bf16_to_f32(uint16_t v) {
    uint32_t bits = uint32_t(v) << 16;
    float out;
    std::memcpy(&out, &bits, 4);
    return out;
}

// scipy.ndimage.gaussian_filter1d kernel: truncated at radius
// int(4*sigma + 0.5), normalized to sum 1 (ops/sliding_window.py parity)
std::vector<double> gaussian_kernel1d(double sigma) {
    int radius = int(4.0 * sigma + 0.5);
    std::vector<double> k(2 * radius + 1);
    double sum = 0;
    for (int i = -radius; i <= radius; ++i) {
        double v = std::exp(-0.5 * i * i / (sigma * sigma));
        k[i + radius] = v;
        sum += v;
    }
    for (double& v : k) v /= sum;
    return k;
}

// Separable gaussian importance map == scipy gaussian_filter of a center
// impulse with mode="constant": product of 1-D kernels centered at
// patch[d]//2, zero outside the truncation radius, then normalized to max 1
// and zeros clamped to the smallest positive value.
std::vector<float> compute_gaussian_map(const std::array<int, 3>& patch) {
    std::array<std::vector<double>, 3> k1;
    std::array<int, 3> center, radius;
    for (int d = 0; d < 3; ++d) {
        double sigma = patch[d] / 8.0;
        k1[d] = gaussian_kernel1d(sigma);
        center[d] = patch[d] / 2;
        radius[d] = int(k1[d].size() / 2);
    }
    auto tap = [&](int d, int i) -> double {
        int off = i - center[d] + radius[d];
        if (off < 0 || off >= int(k1[d].size())) return 0.0;
        return k1[d][off];
    };
    std::vector<float> g(size_t(patch[0]) * patch[1] * patch[2]);
    double maxv = 0;
    size_t idx = 0;
    for (int i = 0; i < patch[0]; ++i)
        for (int j = 0; j < patch[1]; ++j)
            for (int l = 0; l < patch[2]; ++l) {
                double v = tap(0, i) * tap(1, j) * tap(2, l);
                g[idx++] = float(v);
                maxv = std::max(maxv, v);
            }
    float minpos = std::numeric_limits<float>::max();
    for (float& v : g) {
        v = float(v / maxv);
        if (v > 0) minpos = std::min(minpos, v);
    }
    for (float& v : g)
        if (v == 0) v = minpos;
    return g;
}

// Per-axis tile starts: at most patch*step apart, evenly spread, last tile
// flush with the border (ops/sliding_window.py compute_steps_for_sliding_window)
std::vector<int64_t> steps_for_axis(int64_t image, int64_t tile, double step) {
    int64_t max_start = image - tile;
    int64_t num = int64_t(std::ceil(double(max_start) / (tile * step))) + 1;
    std::vector<int64_t> out(num);
    if (num == 1) {
        out[0] = 0;
        return out;
    }
    double actual = double(max_start) / (num - 1);
    for (int64_t i = 0; i < num; ++i)
        out[i] = int64_t(std::llround(actual * i));
    return out;
}

// --------------------------------------------------------------- PJRT client
#define PJRT_CALL(api, fn, args_ptr)                                         \
    do {                                                                     \
        PJRT_Error* _err = (api)->fn(args_ptr);                              \
        if (_err) throw_pjrt_error((api), _err, #fn);                        \
    } while (0)

[[noreturn]] void throw_pjrt_error(const PJRT_Api* api, PJRT_Error* err,
                                   const char* where) {
    PJRT_Error_Message_Args m{};
    m.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
    m.error = err;
    api->PJRT_Error_Message(&m);
    std::string msg = std::string(where) + ": " +
                      std::string(m.message, m.message_size);
    PJRT_Error_Destroy_Args d{};
    d.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
    d.error = err;
    api->PJRT_Error_Destroy(&d);
    throw std::runtime_error(msg);
}

// Minimal serialized xla.CompileOptionsProto (hand-encoded wire format; field
// numbers from xla/pjrt/proto/compile_options.proto):
//   executable_build_options {num_replicas: 1 num_partitions: 1}  (field 3)
//   compile_portable_executable: true                             (field 4)
const char kCompileOptionsProto[] = {0x1a, 0x04, 0x20, 0x01, 0x28, 0x01,
                                     0x20, 0x01};

class PjrtContext {
  public:
    PjrtContext(const std::string& plugin_path, const std::string& mlir_path) {
        handle_ = dlopen(plugin_path.c_str(), RTLD_NOW | RTLD_LOCAL);
        if (!handle_)
            throw std::runtime_error("dlopen " + plugin_path + ": " + dlerror());
        auto get_api = reinterpret_cast<const PJRT_Api* (*)()>(
            dlsym(handle_, "GetPjrtApi"));
        if (!get_api)
            throw std::runtime_error(plugin_path + " exports no GetPjrtApi");
        api_ = get_api();
        if (!api_) throw std::runtime_error("GetPjrtApi returned null");

        if (api_->PJRT_Plugin_Initialize) {
            PJRT_Plugin_Initialize_Args init{};
            init.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
            PJRT_CALL(api_, PJRT_Plugin_Initialize, &init);
        }

        PJRT_Client_Create_Args cc{};
        cc.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
        PJRT_CALL(api_, PJRT_Client_Create, &cc);
        client_ = cc.client;

        PJRT_Client_AddressableDevices_Args ad{};
        ad.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
        ad.client = client_;
        PJRT_CALL(api_, PJRT_Client_AddressableDevices, &ad);
        if (ad.num_addressable_devices == 0)
            throw std::runtime_error("PJRT plugin has no addressable devices");
        device_ = ad.addressable_devices[0];

        std::string code = read_file(mlir_path);
        PJRT_Program prog{};
        prog.struct_size = PJRT_Program_STRUCT_SIZE;
        prog.code = code.data();
        prog.code_size = code.size();
        prog.format = "mlir";
        prog.format_size = 4;
        PJRT_Client_Compile_Args comp{};
        comp.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
        comp.client = client_;
        comp.program = &prog;
        comp.compile_options = kCompileOptionsProto;
        comp.compile_options_size = sizeof(kCompileOptionsProto);
        PJRT_CALL(api_, PJRT_Client_Compile, &comp);
        executable_ = comp.executable;
    }

    ~PjrtContext() {
        if (executable_) {
            PJRT_LoadedExecutable_Destroy_Args d{};
            d.struct_size = PJRT_LoadedExecutable_Destroy_Args_STRUCT_SIZE;
            d.executable = executable_;
            if (auto* e = api_->PJRT_LoadedExecutable_Destroy(&d)) free_error(e);
        }
        if (client_) {
            PJRT_Client_Destroy_Args d{};
            d.struct_size = PJRT_Client_Destroy_Args_STRUCT_SIZE;
            d.client = client_;
            if (auto* e = api_->PJRT_Client_Destroy(&d)) free_error(e);
        }
        // The plugin stays loaded: PJRT runtimes don't support clean dlclose.
    }

    void free_error(PJRT_Error* e) const {
        PJRT_Error_Destroy_Args d{};
        d.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
        d.error = e;
        api_->PJRT_Error_Destroy(&d);
    }

    void await_and_destroy_event(PJRT_Event* ev) const {
        if (!ev) return;
        PJRT_Event_Await_Args aw{};
        aw.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
        aw.event = ev;
        if (auto* e = api_->PJRT_Event_Await(&aw)) throw_pjrt_error(api_, e,
                                                                    "Event_Await");
        PJRT_Event_Destroy_Args d{};
        d.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
        d.event = ev;
        api_->PJRT_Event_Destroy(&d);
    }

    PJRT_Buffer* to_device(const void* data, PJRT_Buffer_Type type,
                           const std::vector<int64_t>& dims) const {
        PJRT_Client_BufferFromHostBuffer_Args a{};
        a.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
        a.client = client_;
        a.data = data;
        a.type = type;
        a.dims = dims.data();
        a.num_dims = dims.size();
        a.host_buffer_semantics =
            PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
        a.device = device_;
        PJRT_CALL(api_, PJRT_Client_BufferFromHostBuffer, &a);
        await_and_destroy_event(a.done_with_host_buffer);
        return a.buffer;
    }

    // Executes the one-device executable on `args`, returns the output buffers.
    std::vector<PJRT_Buffer*> execute(const std::vector<PJRT_Buffer*>& args,
                                      size_t num_outputs) const {
        PJRT_ExecuteOptions opts{};
        opts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;
        PJRT_Buffer* const* arg_list[1] = {args.data()};
        std::vector<PJRT_Buffer*> outs(num_outputs, nullptr);
        PJRT_Buffer** out_list[1] = {outs.data()};
        PJRT_Event* done[1] = {nullptr};

        PJRT_LoadedExecutable_Execute_Args ex{};
        ex.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
        ex.executable = executable_;
        ex.options = &opts;
        ex.argument_lists = arg_list;
        ex.num_devices = 1;
        ex.num_args = args.size();
        ex.output_lists = out_list;
        ex.device_complete_events = done;
        ex.execute_device = device_;
        PJRT_CALL(api_, PJRT_LoadedExecutable_Execute, &ex);
        await_and_destroy_event(done[0]);
        return outs;
    }

    size_t num_outputs() const {
        PJRT_LoadedExecutable_GetExecutable_Args g{};
        g.struct_size = PJRT_LoadedExecutable_GetExecutable_Args_STRUCT_SIZE;
        g.loaded_executable = executable_;
        PJRT_CALL(api_, PJRT_LoadedExecutable_GetExecutable, &g);
        PJRT_Executable_NumOutputs_Args n{};
        n.struct_size = PJRT_Executable_NumOutputs_Args_STRUCT_SIZE;
        n.executable = g.executable;
        PJRT_CALL(api_, PJRT_Executable_NumOutputs, &n);
        PJRT_Executable_Destroy_Args d{};
        d.struct_size = PJRT_Executable_Destroy_Args_STRUCT_SIZE;
        d.executable = g.executable;
        if (auto* e = api_->PJRT_Executable_Destroy(&d)) free_error(e);
        return n.num_outputs;
    }

    void to_host(PJRT_Buffer* buf, void* dst, size_t dst_size) const {
        PJRT_Buffer_ToHostBuffer_Args a{};
        a.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
        a.src = buf;
        a.dst = dst;
        a.dst_size = dst_size;
        PJRT_CALL(api_, PJRT_Buffer_ToHostBuffer, &a);
        await_and_destroy_event(a.event);
    }

    PJRT_Buffer_Type element_type(PJRT_Buffer* buf) const {
        PJRT_Buffer_ElementType_Args a{};
        a.struct_size = PJRT_Buffer_ElementType_Args_STRUCT_SIZE;
        a.buffer = buf;
        PJRT_CALL(api_, PJRT_Buffer_ElementType, &a);
        return a.type;
    }

    std::vector<int64_t> dimensions(PJRT_Buffer* buf) const {
        PJRT_Buffer_Dimensions_Args a{};
        a.struct_size = PJRT_Buffer_Dimensions_Args_STRUCT_SIZE;
        a.buffer = buf;
        PJRT_CALL(api_, PJRT_Buffer_Dimensions, &a);
        return std::vector<int64_t>(a.dims, a.dims + a.num_dims);
    }

    void destroy_buffer(PJRT_Buffer* buf) const {
        PJRT_Buffer_Destroy_Args d{};
        d.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
        d.buffer = buf;
        if (auto* e = api_->PJRT_Buffer_Destroy(&d)) free_error(e);
    }

  private:
    void* handle_ = nullptr;
    const PJRT_Api* api_ = nullptr;
    PJRT_Client* client_ = nullptr;
    PJRT_Device* device_ = nullptr;
    PJRT_LoadedExecutable* executable_ = nullptr;
};

// ------------------------------------------------------------------- backend
class PjrtBackend : public Backend {
  public:
    PjrtBackend(const std::string& plugin_path, const std::string& mlir_path,
                bool bf16_input)
        : ctx_(plugin_path, mlir_path), bf16_input_(bf16_input) {}

    Logits infer_volume(const std::vector<float>& pre,
                        const std::array<int64_t, 3>& shape,
                        const EngineConfig& cfg) override {
        const std::array<int, 3> patch = cfg.patch_size;
        const int K = cfg.num_class;

        // pad volume up to >= patch per axis (centered, zeros — matches
        // ops/pad.pad_nd_image used by the Python predictor)
        std::array<int64_t, 3> padded{}, lo{};
        for (int d = 0; d < 3; ++d) {
            padded[d] = std::max<int64_t>(shape[d], patch[d]);
            lo[d] = (padded[d] - shape[d]) / 2;
        }
        std::vector<float> vol(size_t(padded[0]) * padded[1] * padded[2], 0.f);
        for (int64_t k = 0; k < shape[2]; ++k)
            for (int64_t j = 0; j < shape[1]; ++j)
                for (int64_t i = 0; i < shape[0]; ++i)
                    vol[(i + lo[0]) +
                        padded[0] * ((j + lo[1]) + padded[1] * (k + lo[2]))] =
                        pre[i + shape[0] * (j + shape[1] * k)];

        auto sx = steps_for_axis(padded[0], patch[0], cfg.step_size);
        auto sy = steps_for_axis(padded[1], patch[1], cfg.step_size);
        auto sz = steps_for_axis(padded[2], patch[2], cfg.step_size);

        std::vector<float> gauss =
            cfg.use_gaussian
                ? compute_gaussian_map(patch)
                : std::vector<float>(size_t(patch[0]) * patch[1] * patch[2],
                                     1.f);

        const size_t patch_n = size_t(patch[0]) * patch[1] * patch[2];
        const int B = std::max(1, cfg.tile_batch);
        std::vector<float> acc(size_t(K) * padded[0] * padded[1] * padded[2],
                               0.f);
        std::vector<float> wsum(size_t(padded[0]) * padded[1] * padded[2], 0.f);
        std::vector<float> tiles(size_t(B) * patch_n);
        std::vector<uint16_t> tiles_bf16(bf16_input_ ? size_t(B) * patch_n : 0);
        std::vector<float> logits_f32(size_t(B) * patch_n * K);
        std::vector<uint16_t> logits_bf16;
        const size_t n_out = ctx_.num_outputs();
        if (n_out != 1)
            throw std::runtime_error("expected single-output executable");

        // executable input layout: (B, px, py, pz, 1) channels-last; B must
        // match the batch dimension the artifact was exported with
        std::vector<int64_t> in_dims = {B, patch[0], patch[1], patch[2], 1};

        std::vector<std::array<int64_t, 3>> starts;
        for (int64_t x0 : sx)
            for (int64_t y0 : sy)
                for (int64_t z0 : sz) starts.push_back({x0, y0, z0});

        if (cfg.skip_air_tiles) {
            // empty-tile skipping on the normalized volume: one-pass 8^3
            // block maxima, then drop tiles whose covering blocks all stay
            // below the air threshold (voxels covered only by dropped tiles
            // have weight 0 -> argmax 0 = background). Whole-body CTs are
            // typically 30-50% air (parity with the Python TurboPipeline).
            const float thr = (std::min(cfg.lower_bound + cfg.air_margin_hu,
                                        cfg.upper_bound) -
                               cfg.mean) / cfg.std;
            const int64_t bs = 8;
            const int64_t gx = (padded[0] + bs - 1) / bs;
            const int64_t gy = (padded[1] + bs - 1) / bs;
            const int64_t gz = (padded[2] + bs - 1) / bs;
            std::vector<float> bmax(size_t(gx) * gy * gz, -1e30f);
            for (int64_t z = 0; z < padded[2]; ++z)
                for (int64_t y = 0; y < padded[1]; ++y) {
                    const float* row = vol.data() +
                        padded[0] * (y + padded[1] * z);
                    float* brow = bmax.data() +
                        gx * ((y / bs) + gy * (z / bs));
                    for (int64_t x = 0; x < padded[0]; ++x) {
                        float v = row[x];
                        if (v > brow[x / bs]) brow[x / bs] = v;
                    }
                }
            std::vector<std::array<int64_t, 3>> kept;
            for (const auto& s : starts) {
                bool body = false;
                for (int64_t bx = s[0] / bs;
                     bx <= (s[0] + patch[0] - 1) / bs && !body; ++bx)
                    for (int64_t by = s[1] / bs;
                         by <= (s[1] + patch[1] - 1) / bs && !body; ++by)
                        for (int64_t bz = s[2] / bs;
                             bz <= (s[2] + patch[2] - 1) / bs; ++bz)
                            if (bmax[bx + gx * (by + gy * bz)] > thr) {
                                body = true;
                                break;
                            }
                if (body) kept.push_back(s);
            }
            if (!kept.empty()) starts.swap(kept);
        }

        auto crop_tile = [&](size_t slot, const std::array<int64_t, 3>& s) {
            // crop (x fastest in volume) -> row-major (px,py,pz) order
            // expected by the channels-last executable
            float* dst = tiles.data() + slot * patch_n;
            for (int i = 0; i < patch[0]; ++i)
                for (int j = 0; j < patch[1]; ++j)
                    for (int k = 0; k < patch[2]; ++k)
                        dst[size_t(i) * patch[1] * patch[2] +
                            size_t(j) * patch[2] + k] =
                            vol[(s[0] + i) +
                                padded[0] * ((s[1] + j) +
                                             padded[1] * (s[2] + k))];
        };
        auto accumulate_tile = [&](size_t slot,
                                   const std::array<int64_t, 3>& s) {
            const float* lg = logits_f32.data() + slot * patch_n * K;
            for (int i = 0; i < patch[0]; ++i)
                for (int j = 0; j < patch[1]; ++j)
                    for (int k = 0; k < patch[2]; ++k) {
                        size_t g = size_t(i) * patch[1] * patch[2] +
                                   size_t(j) * patch[2] + k;
                        float w = gauss[g];
                        size_t v = (s[0] + i) +
                                   padded[0] * ((s[1] + j) +
                                                padded[1] * (s[2] + k));
                        wsum[v] += w;
                        for (int c = 0; c < K; ++c)
                            acc[size_t(c) * padded[0] * padded[1] * padded[2] +
                                v] += w * lg[g * K + c];
                    }
        };

        for (size_t t0 = 0; t0 < starts.size(); t0 += size_t(B)) {
            size_t n_real = std::min(size_t(B), starts.size() - t0);
            for (size_t b = 0; b < size_t(B); ++b)  // pad by repeating the last
                crop_tile(b, starts[t0 + std::min(b, n_real - 1)]);

            PJRT_Buffer* in;
            if (bf16_input_) {
                for (size_t p = 0; p < size_t(B) * patch_n; ++p)
                    tiles_bf16[p] = f32_to_bf16(tiles[p]);
                in = ctx_.to_device(tiles_bf16.data(), PJRT_Buffer_Type_BF16,
                                    in_dims);
            } else {
                in = ctx_.to_device(tiles.data(), PJRT_Buffer_Type_F32,
                                    in_dims);
            }
            auto outs = ctx_.execute({in}, 1);
            ctx_.destroy_buffer(in);

            // fetch logits (B, px, py, pz, K)
            PJRT_Buffer_Type ot = ctx_.element_type(outs[0]);
            if (ot == PJRT_Buffer_Type_BF16) {
                logits_bf16.resize(size_t(B) * patch_n * K);
                ctx_.to_host(outs[0], logits_bf16.data(),
                             logits_bf16.size() * 2);
                for (size_t p = 0; p < logits_bf16.size(); ++p)
                    logits_f32[p] = bf16_to_f32(logits_bf16[p]);
            } else if (ot == PJRT_Buffer_Type_F32) {
                ctx_.to_host(outs[0], logits_f32.data(),
                             logits_f32.size() * 4);
            } else {
                throw std::runtime_error("unexpected executable output dtype");
            }
            ctx_.destroy_buffer(outs[0]);

            for (size_t b = 0; b < n_real; ++b)
                accumulate_tile(b, starts[t0 + b]);
        }

        // normalize + crop padding back off; output layout (K, nx, ny, nz)
        Logits out;
        out.shape = shape;
        out.num_class = K;
        out.data.resize(size_t(K) * shape[0] * shape[1] * shape[2]);
        const size_t pvol = size_t(padded[0]) * padded[1] * padded[2];
        for (int c = 0; c < K; ++c)
            for (int64_t i = 0; i < shape[0]; ++i)
                for (int64_t j = 0; j < shape[1]; ++j)
                    for (int64_t k = 0; k < shape[2]; ++k) {
                        size_t v = (i + lo[0]) +
                                   padded[0] * ((j + lo[1]) +
                                                padded[1] * (k + lo[2]));
                        // wsum==0 only where every covering tile was skipped
                        // as air: emit 0 logits everywhere -> argmax 0 =
                        // background (not NaN)
                        out.data[size_t(c) * shape[0] * shape[1] * shape[2] +
                                 i + shape[0] * (j + shape[1] * k)] =
                            wsum[v] > 0.f
                                ? acc[size_t(c) * pvol + v] / wsum[v]
                                : 0.f;
                    }
        return out;
    }

  private:
    PjrtContext ctx_;
    bool bf16_input_;
};

}  // namespace

std::unique_ptr<Backend> make_pjrt_backend(const std::string& plugin_path,
                                           const std::string& artifact_path,
                                           bool bf16_input) {
    return std::make_unique<PjrtBackend>(plugin_path, artifact_path,
                                         bf16_input);
}

}  // namespace fast_nnunet
