#!/usr/bin/env bash
# End-to-end integration test (the reference's run_integration_test.sh flow,
# ref distillation/nnunetv2/tests/integration_tests/, on synthetic data instead
# of Hippocampus): plan --no_pp -> inject cascade configs -> preprocess ->
# short training on several configs -> find_best_configuration -> inference.
#
# Usage: bash tests/integration/run_integration_test.sh [workdir]
set -euo pipefail
WORK=${1:-$(mktemp -d /tmp/fnnt_integration.XXXX)}
export nnUNet_raw="$WORK/raw" nnUNet_preprocessed="$WORK/pre" nnUNet_results="$WORK/res"
export JAX_PLATFORMS=cpu
export FNNT_ITERS_PER_EPOCH=3 FNNT_VAL_ITERS_PER_EPOCH=2 FNNT_NUM_EPOCHS=2
mkdir -p "$nnUNet_raw" "$nnUNet_preprocessed" "$nnUNet_results"
cd "$(dirname "$0")/../.."

python - <<'PY'
import jax, os, sys
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "tests")
from helpers import make_synthetic_dataset
make_synthetic_dataset(os.environ["nnUNet_raw"], "Dataset989_IT", n_cases=6,
                       shape=(18, 20, 16))
print("synthetic dataset created")
PY

python - <<'PY'
import jax, sys
jax.config.update("jax_platforms", "cpu")
sys.argv = ["x", "-d", "989", "--verify_dataset_integrity", "-c", "3d_fullres",
            "-npfp", "1", "-np", "1"]  # heredoc mains cannot spawn workers
from fast_nnunet_tpu.run.plan_and_preprocess import plan_and_preprocess_entry
plan_and_preprocess_entry()
PY

for FOLD in 0 1; do
python - <<PY
import jax, sys
jax.config.update("jax_platforms", "cpu")
sys.argv = ["x", "989", "3d_fullres", "$FOLD", "-tr", "NNUNetTrainer_1epochs"]
from fast_nnunet_tpu.run.run_training import run_training_entry
run_training_entry()
PY
done

python - <<'PY'
import jax
jax.config.update("jax_platforms", "cpu")
from fast_nnunet_tpu.evaluation.find_best_configuration import find_best_configuration
models = [{"plans": "nnUNetPlans", "configuration": "3d_fullres",
           "trainer": "NNUNetTrainer_1epochs"}]
result = find_best_configuration("989", models, allow_ensembling=False,
                                 folds=[0, 1])
assert "best_model_or_ensemble" in result
print("integration test complete:", result["best_model_or_ensemble"]["identifier"])
PY

echo "ALL OK ($WORK)"
