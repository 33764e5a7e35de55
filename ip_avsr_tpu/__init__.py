"""ip_avsr_tpu — a TPU-native audio-visual speech recognition framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
``lzuwei/ip-avsr`` research codebase (Theano/Lasagne + MATLAB DBN toolbox):

* image-preprocessing feature streams (deltas, DCT, diff-images, normalization)
* DBN/RBM pretraining of dense "DBNF" encoders (replacing the MATLAB toolbox)
* multi-stream AdeNet models: per-stream encoder -> in-graph delta features ->
  per-stream LSTM -> {sum | adaptive-sum | concat} fusion -> BLSTM aggregator ->
  per-timestep softmax with majority voting
* a trainer with GL/PQ early stopping, classification-rate eval and confusion
  matrices, plus checkpoint/resume
* TPU-first execution: jit/pjit over a device mesh for data/tensor/sequence
  parallelism, Pallas LSTM + delta kernels, MXU-batched encoder matmuls,
  static-shape batching
* production serving: pipelined/micro-batched batch-1 serving, bucketed and
  mesh-sharded bulk servers, streaming (online) sessions with exact batch
  parity, and self-contained jax.export deployment artifacts (``export.py``)

The reference is a blueprint for behavior, not for architecture: everything
here is functional JAX (pure functions over parameter pytrees), compiled by
XLA, with Pallas kernels on the hot paths.
"""

__version__ = "0.1.0"
