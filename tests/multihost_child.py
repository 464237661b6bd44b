"""Child process for the multi-host training smoke test: one simulated host.

Launched by tests/test_multihost.py with JAX_PLATFORMS=cpu and
--xla_force_host_platform_device_count=2, so two of these form a 2-host x
2-device cluster over localhost. Must configure the backend BEFORE any jax
device query (the ambient sitecustomize pins jax_platforms='axon,cpu').
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    coordinator, process_id = sys.argv[1], int(sys.argv[2])
    from fast_nnunet_tpu.run.run_training import run_training

    trainer = run_training(
        "Dataset988_MH", "3d_fullres", 0,
        num_hosts=2, coordinator_address=coordinator, process_id=process_id)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()
    assert trainer.mesh.shape["data"] == 4
    print(f"RANK{process_id}_TRAIN_LOSS "
          f"{trainer.logger.logging['train_losses'][-1]:.6f}")
    print(f"RANK{process_id}_OK")


if __name__ == "__main__":
    main()
