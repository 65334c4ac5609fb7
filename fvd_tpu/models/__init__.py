"""JAX/flax model zoo.

TPU-native replacements for the pretrained torch/Caffe models the reference
wraps (SURVEY §2.4): SSD face detector (res10 role), hourglass landmark
regressor + 6D pose head (FAN + SixDRepNet role), CLIP-style dual towers,
MiniLM-class sentence encoder, and a Whisper-style ASR encoder-decoder.

Every model is (a) a flax module with static shapes jit-compiled over
batches, (b) trainable (losses + train-step helpers with overfit smoke
tests), and (c) loadable from converted checkpoints
(``tools/convert_weights.py``) when upstream weights are available.
"""
