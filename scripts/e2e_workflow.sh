#!/usr/bin/env bash
# The complete reference-user workflow as one chain, on synthetic data:
#   corpus -> DBN pretraining -> AE finetuning -> classifier training with
#   the pretrained encoder -> weight surgery back to .mat -> batch-1 demo.
# Mirrors the reference's MATLAB+Python flow (dbn/exampleDBN_AE.m ->
# */ae_finetuner.py -> runners/1stream.py -> extract_encoder_from_model.py
# -> oulu/demo.py) end to end through this framework's CLIs.
#
# Usage: scripts/e2e_workflow.sh [workdir]   (EPOCHS=n to change epochs)
set -euo pipefail
cd "$(dirname "$0")/.."
WORK="${1:-/tmp/ipavsr_e2e}"
EPOCHS="${EPOCHS:-3}"
mkdir -p "$WORK"

echo "== 1/7 synthesize a corpus (reference .mat schema) =="
python - "$WORK" <<'PY'
import sys
import numpy as np, scipy.io as sio
sys.path.insert(0, ".")
from ip_avsr_tpu.cli.nstream import synthesize_dataset
d = synthesize_dataset(90, 144, 10, seed=0)
n = len(d["videoLengthVec"])
d["iterVec"] = (np.arange(n) % 3 + 1).reshape(-1, 1)  # iterations 1,2=train 3=test
sio.savemat(sys.argv[1] + "/corpus.mat", d)
print("corpus:", {k: v.shape for k, v in d.items()})
PY

echo "== 2/7 DBN pretraining (RBM CD-1 -> unfolded AE, w1..wN .mat) =="
python -m ip_avsr_tpu.cli.pretrain_dbn --data "$WORK/corpus.mat" \
  --hidden 64,32,8 --activations sigm,sigm,linear --epochs "$EPOCHS" \
  --batchsize 100 --out "$WORK/ae.mat"

echo "== 3/7 autoencoder finetuning =="
python -m ip_avsr_tpu.cli.ae_finetuner --ae "$WORK/ae.mat" --layers 6 \
  --activations sigmoid,sigmoid,linear,sigmoid,sigmoid,sigmoid \
  --data "$WORK/corpus.mat" --epochs "$EPOCHS" --out "$WORK/ae_finetuned.mat"

echo "== 4/7 train the classifier on the pretrained encoder =="
cat > "$WORK/e2e.ini" <<INI
[stream1]
data = $WORK/corpus.mat
input_dimensions = 144
imagesize = 12,12
model = $WORK/ae_finetuned.mat
shape = 64,32,8
nonlinearities = sigmoid,sigmoid,linear
samplewisenormalize = true

[lstm_classifier]
windowsize = 4
output_classes = 10
lstm_size = 24
matlab_target_offset = true

[training]
num_epoch = $((EPOCHS * 4))
epochsize = 20
batchsize = 10
learning_rate = 0.003
optimizer = adam
validation_window = 50
INI
python -m ip_avsr_tpu.cli.nstream --config "$WORK/e2e.ini" --split itervec \
  --save_best "$WORK/model.pkl"

echo "== 5/7 weight surgery back to the .mat ABI =="
python -m ip_avsr_tpu.cli.extract_weights --model "$WORK/model.pkl" \
  --encoder-stream s1 --lstm "aggregator/0/fwd:agg_fwd" \
  --out "$WORK/weights_extracted.mat"

echo "== 6/7 batch-1 serve demo with the trained model =="
python -m ip_avsr_tpu.cli.demo --config "$WORK/e2e.ini" \
  --model "$WORK/model.pkl" --synthetic 8

echo "== 7/7 export a self-contained serving artifact and serve from it =="
python -m ip_avsr_tpu.cli.export_model --config "$WORK/e2e.ini" \
  --model "$WORK/model.pkl" --out "$WORK/model.ipax" --check
python -m ip_avsr_tpu.cli.demo --config "$WORK/e2e.ini" \
  --artifact "$WORK/model.ipax" --synthetic 8

echo "e2e workflow complete; artifacts in $WORK:"
ls -la "$WORK"
