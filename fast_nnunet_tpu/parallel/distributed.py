"""Multi-host training support.

The reference trains multi-GPU with mp.spawn + NCCL process groups (ref
distillation/nnunetv2/run/run_training.py:101-113, each rank gets a batch
slice and an adjusted oversample fraction via
nnUNetTrainer._set_batch_size_and_oversample). The TPU answer is
multi-controller JAX: every host runs the same program, jax.distributed
wires the hosts together, the mesh spans all global devices, and XLA inserts
the gradient all-reduce from the shardings — no process groups, no explicit
collectives. Each host loads only its shard of the global batch
(jax.make_array_from_process_local_data assembles the global array).
"""
from typing import Optional, Tuple

import jax


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None,
                           local_device_ids=None) -> None:
    """Idempotent jax.distributed.initialize. With no arguments, JAX
    auto-detects the topology (TPU pods via metadata / cluster envs); explicit
    arguments support CPU/GPU clusters and tests."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id,
                                   local_device_ids=local_device_ids)
    except RuntimeError as e:  # already initialized: keep the existing runtime
        if "already initialized" not in str(e).lower():
            raise


def is_main_process() -> bool:
    return jax.process_index() == 0


def local_batch_and_oversample(global_batch_size: int,
                               oversample_percent: float,
                               process_id: int,
                               num_processes: int) -> Tuple[int, float]:
    """Split the global batch over hosts and give each host the oversample
    fraction matching its slice of the deterministic global rule "the last
    round(bs * oversample) samples of the batch are fg-forced" (ref
    nnUNetTrainer._set_batch_size_and_oversample semantics: global behavior
    must not depend on the number of workers)."""
    base, rem = divmod(global_batch_size, num_processes)
    sizes = [base + (1 if r < rem else 0) for r in range(num_processes)]
    my_start = sum(sizes[:process_id])
    my_end = my_start + sizes[process_id]
    first_fg = round(global_batch_size * (1 - oversample_percent))
    n_fg = max(0, my_end - max(first_fg, my_start))
    local_bs = sizes[process_id]
    return local_bs, n_fg / max(1, local_bs)
