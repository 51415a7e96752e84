"""TPU-native multimodal reaction generation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
TUT-SLP-lab/MultimodalReactionGeneration (the "reference"): given a dyadic
dialogue, predict one participant's head motion (3-D Euler angle + face
centroid with 1st/2nd deltas, 12.5 fps) from the partner's speech audio
(log-mel fbank + log-power, 100 Hz) and both participants' motion history.

Layer map (mirrors the reference's seven layers, re-architected TPU-first):

  corpus/   L0/L1 corpus ops (alignment, landmark->angle/centroid, npz export)
  data/     L2-L4 feature preprocessing, manifest building, batching
  ops/      pure-function numeric kernels (dsp, rotations, masks, vad, xcorr)
  nn/       model block library (lax.scan LSTM/GRU, MHA, mixers, metaformer)
  models/   simple_lstm, lstm_with_sampling, lstmformer
  train/    optax train step, metrics, orbax checkpointing, fit loop
  infer/    autoregressive decode engine (lax.scan + KV ring buffers), streaming
  parallel/ jax.sharding mesh construction, data/model-parallel shardings
  utils/    config system (YAML + interpolation), wav IO, logging, timebase
"""

__version__ = "0.1.0"
