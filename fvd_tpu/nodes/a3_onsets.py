"""A3: audio onsets + fps-aligned RMS envelope.

Reference behavior (``nodes/A_nodes/a3_audio_onsets.py:9-78``): load
``audio_16k.wav``, detect onsets (librosa), compute an RMS envelope with
``hop = int(sr/fps)`` and ``frame_length = 2*hop`` interpolated to
``duration*fps`` samples, and write ``audio_onsets``/``onset_count``/
``audio_envelope`` plus ``metadata.onset_detection_method``.

TPU-native: one device program — STFT -> mel (MXU matmul) -> spectral-flux
onset envelope -> vectorized peak picking, plus the framed RMS reduction —
no librosa, no host DSP.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from fvd_tpu.config import Config, default_config
from fvd_tpu.ops import spectral
from fvd_tpu.runtime.debug import dump_node_debug
from fvd_tpu.state import State, StateDelta
from fvd_tpu.utils.wav import read_wav, to_mono


def run(state: State, config: Config = default_config()) -> StateDelta:
    output_dir = state.get("data_dir")
    audio_path = os.path.join(output_dir or "", "audio_16k.wav")
    cfg = config.audio
    cached = state.get("audio_16k")
    if cached is not None:
        # device-resident A1 output: no file re-read, no host->HBM transfer
        y = jnp.asarray(cached, jnp.float32)
        sr = cfg.target_sr
    elif output_dir and os.path.exists(audio_path):
        samples, sr = read_wav(audio_path)
        y = jnp.asarray(to_mono(samples), jnp.float32)
    else:
        print(f"A3: audio file not found at {audio_path}")
        return {}

    metadata = dict(state.get("metadata", {}) or {})
    fps = metadata.get("fps", 30.0)
    duration = metadata.get("duration")

    # Whole front-end in ONE device dispatch (onsets + envelope); under
    # multi-video overlap the dispatch + fetch coalesce across videos
    # (providers/coalesce.py run_program).
    frames_per_s = sr / cfg.hop_length
    to_frames = lambda s: max(int(round(s * frames_per_s)), 1)
    env_hop = int(sr / fps)
    env_target = int(duration * fps) if duration else 0
    params = dict(
        sr=sr,
        n_fft=cfg.n_fft,
        hop=cfg.hop_length,
        n_mels=cfg.n_mels,
        pre_max=to_frames(cfg.peak_pre_max_s),
        post_max=max(int(round(cfg.peak_post_max_s * frames_per_s)), 0) + 1,
        pre_avg=to_frames(cfg.peak_pre_avg_s),
        post_avg=to_frames(cfg.peak_post_avg_s) + 1,
        wait=to_frames(cfg.peak_wait_s),
        delta=cfg.peak_delta,
        env_frame=2 * env_hop,
        env_hop=env_hop,
        env_target=env_target,
    )

    from fvd_tpu.providers.coalesce import run_program

    def _run_batch(ys):
        masks, envs = spectral.audio_frontend_program_batch(
            jnp.stack([jnp.asarray(v, jnp.float32) for v in ys]), **params)
        masks, envs = np.asarray(masks), np.asarray(envs)  # one fetch
        return list(zip(masks, envs))

    mask, envelope = run_program(
        "a3_frontend", (int(y.shape[0]),) + tuple(sorted(params.items())),
        y, _run_batch)
    onset_frames = np.nonzero(np.asarray(mask))[0]
    onset_list = [float(f * cfg.hop_length / sr) for f in onset_frames]
    envelope_list = np.asarray(envelope).tolist()

    metadata["onset_detection_method"] = "spectral_flux_peak_pick"

    dump_node_debug(
        output_dir,
        "A3",
        {"onset_count": len(onset_list), "envelope_len": len(envelope_list), "fps": fps},
    )
    return {
        "audio_onsets": onset_list,
        "onset_count": len(onset_list),
        "audio_envelope": envelope_list,
        "metadata": metadata,
    }
