"""IN: ingest — acquire the video, extract audio, probe metadata.

Reference behavior (``main.py:56-290``): create ``processed/video_<ts>/``,
download (URL, with retries) or copy (local) the video, verify decodability
(transcode when possible), extract ``audio.wav``, record metadata
``{duration, fps, size, rotation}``, save a corpus copy under ``videos/``.

Differences by design:
* decode sanity is a cv2 probe; transcode only if an ffmpeg binary exists
  (no NVENC — no GPU encode concept on TPU hosts);
* audio extraction prefers ffmpeg, else a sibling ``.wav`` (hermetic path).
"""

from __future__ import annotations

import datetime
import os
import shutil

from fvd_tpu.config import Config, default_config
from fvd_tpu.providers.media import Downloader, VideoReader, extract_audio, ffmpeg_bin
from fvd_tpu.runtime.debug import dump_node_debug
from fvd_tpu.state import State, StateDelta


def probe_codec_rotation(video_path: str) -> tuple:
    """(codec_name, rotation_degrees) via the native libav shim — the role
    ffprobe plays in the reference's ingest (main.py:77-170).  ("", 0) when
    the shim or the streams are unavailable."""
    try:
        from fvd_tpu.providers.native_decode import NativeVideo, available

        if not available():
            return "", 0
        with NativeVideo(video_path) as nv:
            rotation, codec = nv.probe_extra()
        return codec, rotation
    except Exception:
        return "", 0


def _transcode_h264(video_path: str) -> bool:
    ff = ffmpeg_bin()
    if not ff:
        return False
    import subprocess

    tmp = video_path + ".h264.mp4"
    proc = subprocess.run(
        [ff, "-y", "-i", video_path, "-c:v", "libx264", "-preset", "fast",
         "-pix_fmt", "yuv420p", "-c:a", "copy", tmp],
        capture_output=True,
        text=True,
    )
    if proc.returncode == 0:
        shutil.move(tmp, video_path)
        return True
    if os.path.exists(tmp):
        os.remove(tmp)
    return False


def _ensure_decodable(video_path: str, debug: bool = False) -> str:
    """Codec probe + AV1->H.264 transcode leg + cv2 readability fallback
    (reference main.py:66-170 minus the NVENC leg — no GPU encode concept
    on TPU hosts)."""
    codec, _ = probe_codec_rotation(video_path)
    if codec in ("av1", "libaom-av1"):
        # the reference transcodes AV1 for its cv2/dlib consumers
        # (main.py:117-170); same leg here, gated on an ffmpeg binary
        if _transcode_h264(video_path):
            print("IN: transcoded AV1 -> H.264 (reference parity leg).")
            return video_path
        print("IN: AV1 stream and no ffmpeg to transcode; relying on libav decode.")
    reader = VideoReader()
    if reader.probe(video_path) is not None:
        return video_path
    if _transcode_h264(video_path):
        print("IN: re-encoded video to H.264 for decodability.")
    else:
        print("IN: video not readable and no ffmpeg available to transcode.")
    return video_path


def run(state: State, config: Config = default_config()) -> StateDelta:
    cfg = config.ingest
    input_path = state.get("input_path", "")
    debug = state.get("debug", False)

    timestamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S_%f")
    output_dir = os.path.join(cfg.processed_dir, f"video_{timestamp}")
    os.makedirs(output_dir, exist_ok=True)

    metadata: dict = {}

    if input_path.startswith(("http://", "https://")):
        downloader = Downloader(retries=cfg.download_retries, backoff_s=cfg.retry_backoff_s)
        video_path, metadata = downloader.download(input_path, output_dir, debug=debug)
        video_path = _ensure_decodable(video_path, debug)
        # corpus copy (reference main.py:221-228)
        try:
            os.makedirs(cfg.videos_dir, exist_ok=True)
            shutil.copy2(video_path, os.path.join(cfg.videos_dir, f"video_{timestamp}.mp4"))
        except Exception as e:
            print(f"IN: warning - failed to save corpus copy: {e}")
    else:
        if not os.path.exists(input_path):
            raise FileNotFoundError(f"Input file not found: {input_path}")
        video_path = os.path.join(output_dir, "video.mp4")
        shutil.copy2(input_path, video_path)
        # keep a sibling wav reachable for the no-ffmpeg audio path
        src_wav = os.path.splitext(input_path)[0] + ".wav"
        if os.path.exists(src_wav):
            shutil.copy2(src_wav, os.path.splitext(video_path)[0] + ".wav")
        video_path = _ensure_decodable(video_path, debug)
        metadata = {"original_path": input_path}

    # Audio extraction (reference main.py:262-283).
    audio_path = os.path.join(output_dir, "audio.wav")
    extracted = extract_audio(video_path, audio_path)
    if extracted is None:
        print("IN: warning - no audio track available for this video.")

    # Metadata probe (rotation/codec via the native shim: the reference
    # records ffprobe's display rotation so V-nodes can upright frames,
    # main.py:77-116).
    meta = VideoReader().probe(video_path)
    codec, rotation = probe_codec_rotation(video_path)
    if meta is not None:
        metadata.update(
            {
                "duration": meta.duration,
                "fps": meta.fps,
                "size": [meta.width, meta.height],
                "rotation": rotation,
            }
        )
        if codec:
            metadata["codec"] = codec

    dump_node_debug(output_dir, "IN", {"video": video_path, "audio": extracted or "none"})
    return {"data_dir": output_dir, "metadata": metadata, "debug": debug}
