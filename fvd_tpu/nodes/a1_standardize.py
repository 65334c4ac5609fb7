"""A1: audio standardization — resample to 16 kHz mono PCM.

Reference behavior (``nodes/A_nodes/a1_demux_audio_extract.py:5-52``):
``audio.wav`` in ``data_dir`` -> ``audio_16k.wav`` (16 kHz, mono, s16),
metadata gains ``audio_sample_rate``/``audio_channels``; missing input is a
warn-and-skip no-op.

TPU-native: the resampler is a single XLA dilated convolution
(fvd_tpu.ops.resample) instead of an ffmpeg subprocess; host I/O is plain
PCM WAV.
"""

from __future__ import annotations

import os

import numpy as np

from fvd_tpu.config import Config, default_config
from fvd_tpu.ops.resample import resample
from fvd_tpu.runtime.debug import dump_node_debug
from fvd_tpu.state import State, StateDelta
from fvd_tpu.utils.wav import read_wav, to_mono, write_wav


def run(state: State, config: Config = default_config()) -> StateDelta:
    output_dir = state.get("data_dir")
    if not output_dir or not os.path.exists(output_dir):
        print(f"A1: data directory not found at {output_dir}")
        return {}

    input_path = os.path.join(output_dir, "audio.wav")
    if not os.path.exists(input_path):
        print(f"A1: audio file not found at {input_path}; skipping standardization.")
        return {}

    target_sr = config.audio.target_sr
    samples, sr = read_wav(input_path)
    mono = to_mono(samples)
    if sr == target_sr:
        resampled_dev = resample(mono, sr, target_sr)  # asarray only
        resampled = np.asarray(resampled_dev)
    else:
        # cross-video coalesced resample: overlapped videos with the same
        # (length, rates) run as ONE batched dispatch + ONE fetch
        from fvd_tpu.ops.resample import resample_batch
        from fvd_tpu.providers.coalesce import run_program

        def _run_batch(monos):
            out = resample_batch(np.stack(monos), sr, target_sr)
            host = np.asarray(out)  # one fetch for the group
            return [(host[i], out[i]) for i in range(len(monos))]

        resampled, resampled_dev = run_program(
            "a1_resample", (len(mono), sr, target_sr), mono, _run_batch)

    output_path = os.path.join(output_dir, "audio_16k.wav")
    write_wav(output_path, resampled, target_sr)

    metadata = dict(state.get("metadata", {}) or {})
    metadata["audio_sample_rate"] = target_sr
    metadata["audio_channels"] = 1

    dump_node_debug(output_dir, "A1", {"audio_path": output_path})
    return {"metadata": metadata, "audio_16k": resampled_dev}
