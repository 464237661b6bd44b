// fast_nnunet_engine CLI — the reference's example driver flow
// (ref engine/fast_nnunet.cpp:12-31: Eva::initializer -> set_config ->
// set_workspace -> LoadData -> infer -> save_mask).
#include <chrono>
#include <cstdlib>
#include <cstring>
#include <iostream>
#include <string>

#include "fast_nnunet/engine.h"

namespace {
void usage(const char* prog) {
    std::cerr << "usage: " << prog
              << " --config model.ini --input ct.nii.gz --output mask.nii.gz\n"
              << "        [--endpoint host:port] [--pjrt plugin.so "
                 "--artifact model_pjrt.mlir [--fp32-input]]\n"
              << "        [--workspace dir] [--verbose]\n"
              << "\nBackends: --pjrt loads the StableHLO artifact in-process "
                 "via the given PJRT\nplugin (libtpu.so on a TPU host); "
                 "--endpoint posts to the serving daemon;\nneither runs the "
                 "null backend (pipeline test: all-background mask).\n";
}
}  // namespace

int main(int argc, char** argv) {
    std::string config, input, output, endpoint, workspace = ".";
    std::string pjrt_plugin, artifact;
    bool verbose = false, fp32_input = false;
    for (int i = 1; i < argc; ++i) {
        std::string a = argv[i];
        auto next = [&](const char* what) -> std::string {
            if (i + 1 >= argc) {
                std::cerr << what << " requires a value\n";
                exit(2);
            }
            return argv[++i];
        };
        if (a == "--config") config = next("--config");
        else if (a == "--input") input = next("--input");
        else if (a == "--output") output = next("--output");
        else if (a == "--endpoint") endpoint = next("--endpoint");
        else if (a == "--pjrt") pjrt_plugin = next("--pjrt");
        else if (a == "--artifact") artifact = next("--artifact");
        else if (a == "--fp32-input") fp32_input = true;
        else if (a == "--workspace") workspace = next("--workspace");
        else if (a == "--verbose") verbose = true;
        else if (a == "--help" || a == "-h") { usage(argv[0]); return 0; }
        else { std::cerr << "unknown arg " << a << "\n"; usage(argv[0]); return 2; }
    }
    if (config.empty() || input.empty() || output.empty()) {
        usage(argv[0]);
        return 2;
    }

    try {
        fast_nnunet::FastnnUNet::Engine engine;
        engine.set_config(config);
        engine.set_workspace(workspace, verbose);
        // reference flow parity: the INI's [model] file_name names the
        // compiled model; with a StableHLO artifact there and a PJRT plugin
        // from the environment, the in-process backend needs no extra flags
        const std::string& model_file = engine.config().file_name;
        if (artifact.empty() && model_file.size() > 5 &&
            model_file.compare(model_file.size() - 5, 5, ".mlir") == 0)
            artifact = model_file;
        if (pjrt_plugin.empty() && !artifact.empty()) {
            if (const char* env = std::getenv("FNN_PJRT_PLUGIN"))
                pjrt_plugin = env;
        }
        if (!pjrt_plugin.empty()) {
            if (artifact.empty())
                throw std::runtime_error("--pjrt needs --artifact (or a "
                                         ".mlir file_name in the INI)");
            engine.set_backend(fast_nnunet::make_pjrt_backend(
                pjrt_plugin, artifact, !fp32_input));
        } else if (!endpoint.empty()) {
            auto colon = endpoint.rfind(':');
            if (colon == std::string::npos)
                throw std::runtime_error("--endpoint must be host:port");
            engine.set_backend(fast_nnunet::make_http_backend(
                endpoint.substr(0, colon),
                std::stoi(endpoint.substr(colon + 1))));
        }

        auto t0 = std::chrono::steady_clock::now();
        fast_nnunet::Volume vol = fast_nnunet::Data::LoadData(input);
        auto t1 = std::chrono::steady_clock::now();
        std::vector<uint8_t> mask = engine.infer(vol, true, false, true);
        auto t2 = std::chrono::steady_clock::now();
        fast_nnunet::Tools::save_mask(mask, vol, output);
        auto t3 = std::chrono::steady_clock::now();

        auto ms = [](auto a, auto b) {
            return std::chrono::duration_cast<std::chrono::milliseconds>(b - a)
                .count();
        };
        std::cout << "load " << ms(t0, t1) << " ms, infer " << ms(t1, t2)
                  << " ms, save " << ms(t2, t3) << " ms -> " << output << "\n";
        return 0;
    } catch (const std::exception& e) {
        std::cerr << "error: " << e.what() << "\n";
        return 1;
    }
}
