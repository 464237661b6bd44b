"""Generate the torch-free import-parity fixture (torch_parity.npz).

Runs the SAME torch model as tests/test_torch_import.py (dnA-style module
naming, the contract of the reference's pretraining loader —
ref distillation/nnunetv2/run/load_pretrained_weights.py:7-69), captures its
state_dict + a forward on a fixed input, and serializes everything to .npz so
the parity test executes in environments WITHOUT torch.

Requires torch (CPU is fine). Re-run only if the fixture contract changes:

    python tests/fixtures/generate_torch_parity.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import torch  # noqa: E402

from test_torch_import import build_torch_unet  # noqa: E402


def main():
    tnet = build_torch_unet()
    gen = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for p in tnet.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.2)

    x = np.random.RandomState(1).rand(2, 1, 16, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x)).numpy()

    # transpconv orientation sub-fixture (small standalone op-level check)
    tt = torch.nn.ConvTranspose3d(4, 3, 2, 2)
    xt = np.random.RandomState(0).rand(1, 4, 6, 6, 6).astype(np.float32)
    with torch.no_grad():
        ref_t = tt(torch.from_numpy(xt)).numpy()

    out = {"__input__": x, "__torch_logits__": ref,
           "__tc_weight__": tt.weight.detach().numpy(),
           "__tc_bias__": tt.bias.detach().numpy(),
           "__tc_input__": xt, "__tc_output__": ref_t,
           "__torch_version__": np.bytes_(torch.__version__)}
    for k, v in tnet.state_dict().items():
        out["sd." + k] = v.detach().numpy()

    path = os.path.join(os.path.dirname(__file__), "torch_parity.npz")
    np.savez_compressed(path, **out)
    print("wrote", path, os.path.getsize(path), "bytes,",
          len(out) - 7, "state_dict entries")


if __name__ == "__main__":
    main()
