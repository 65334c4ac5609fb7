"""Synthetic media + model stand-ins.

Used by the benchmark, the demo path and the hermetic test-suite: generates
videos with a trackable "face" whose mouth aperture is driven by the same
gate as the audio track (so the lip-sync kernel has real signal), plus
deterministic detector/landmark providers with the production batch APIs.
"""

from __future__ import annotations

import os
from typing import List

import numpy as np

from fvd_tpu.providers.media import write_video
from fvd_tpu.providers.vision import FaceBox
from fvd_tpu.utils.wav import write_wav


def make_synthetic_video(
    dirpath: str,
    name: str = "clip",
    duration: float = 6.0,
    fps: float = 10.0,
    width: int = 160,
    height: int = 120,
    gate_hz: float = 1.0,
    sr: int = 16000,
) -> str:
    """Bright-square 'face' video + gated-tone sibling wav; the mouth strip
    and the audio share the same gate -> positive lip-sync correlation."""
    os.makedirs(dirpath, exist_ok=True)
    n = int(fps * duration)
    x1, y1 = int(width * 0.25), int(height * 0.17)
    x2, y2 = int(width * 0.69), int(height * 0.75)
    frames = np.zeros((n, height, width, 3), np.uint8)
    for i in range(n):
        frames[i, :, :] = 16
        frames[i, y1:y2, x1:x2] = 200
        gate = 0.5 * (1 + np.sin(2 * np.pi * gate_hz * (i / fps)))
        mh = int(4 + 10 * gate)
        my = int(height * 0.58)
        frames[i, my : my + mh, int(width * 0.38) : int(width * 0.56)] = 60
    video_path = os.path.join(dirpath, f"{name}.mp4")
    write_video(video_path, frames, fps)

    t = np.arange(int(sr * duration)) / sr
    gate = (np.sin(2 * np.pi * gate_hz * t) > 0).astype(np.float32)
    sig = 0.5 * np.sin(2 * np.pi * 330 * t).astype(np.float32) * gate
    write_wav(os.path.join(dirpath, f"{name}.wav"), sig, sr)
    return video_path


def make_face_video(
    dirpath: str,
    name: str = "face",
    duration: float = 6.0,
    fps: float = 10.0,
    width: int = 320,
    height: int = 240,
    gate_hz: float = 1.0,
    sr: int = 16000,
    seed: int = 0,
    speech_text: str | None = None,
    audio_offset_s: float = 0.0,
    texture_noise: float = 0.0,
    sensor_noise: float = 0.0,
    pose_jitter: float = 0.0,
    mouth_gate_hz: float | None = None,
    speech_renderer: str = "tone",
    heldout: bool = False,
) -> str:
    """Procedural-face video for the real-model path: an elliptical face
    (the trained detector/landmark nets' domain, models/synthetic_faces.py)
    whose mouth aperture follows the same gate as the audio track, with a
    slow center drift that exercises IoU tracking. Unlike
    ``make_synthetic_video`` (fixture-provider blob), this one is meant to
    be analyzed by the actual device models.

    ``speech_text``: render the audio as gate-phased tone-coded speech (the
    trained ASR's domain) instead of a gated tone, so A2 produces a real
    transcript and the C3->E1->E2->E3 claim chain runs end-to-end.

    Deepfake-style manipulation knobs (the labeled-corpus generator's
    levers, mirroring the signals the reference's LR weights act on —
    lr_weights.json: texture +0.82, lip_sync -0.46, headpose_jerk +0.08):

    * ``audio_offset_s`` — delay the audio track relative to the mouth
      gate (circular shift).  NOTE: C1 searches lags up to ±max_lag_s
      (0.5 s), and a periodic gate realigns at full periods — a true
      lip-sync break needs ``mouth_gate_hz``.
    * ``mouth_gate_hz`` — drive the mouth at a different (incommensurate)
      frequency than the audio gate: the dubbed/face-swapped mouth that no
      lag can align, collapsing C1's score.
    * ``texture_noise`` — additive Gaussian noise (that sigma) inside the
      face region only: the blend-seam/GAN-artifact analog V5's forensic
      analysis reacts to.
    * ``pose_jitter`` — per-frame random head-center displacement (pixels):
      raises V4's headpose_jerk / destabilizes landmark tracks.
    * ``sensor_noise`` — additive Gaussian noise over the WHOLE frame: NOT
      a manipulation but real-world capture degradation (low-light sensor
      noise / heavy recompression).  Applied to label-REAL clips it builds
      the classic false-positive hard case — V5's forensic texture score
      rises and landmark/lip tracking degrade on a genuine video, the same
      signature as the reference corpus's noisy reals (e.g. its BBC News
      real carries texture 0.65, `/root/reference/features/2025 June 16
      BBC One minute World News.mp4.json`).
    """
    import cv2

    from fvd_tpu.models.synthetic_faces import draw_face

    os.makedirs(dirpath, exist_ok=True)
    rng = np.random.RandomState(seed)
    if heldout:
        # the held-out face distribution of tools/eval_heldout.py, as a
        # VIDEO: striped gradient background, eccentricity/skin outside the
        # training ranges, glasses + hair accessories — measures whether the
        # PIPELINE's signals survive on faces the models never trained on
        background = np.zeros((height, width, 3), np.uint8)
        base = rng.rand(3) * 150
        grad = np.linspace(0, 80, height)[:, None]
        for c in range(3):
            background[..., c] = np.clip(
                base[c] + grad + 25 * np.sin(
                    np.arange(width)[None, :] / rng.uniform(6, 18)), 0, 255)
        skin = np.array([rng.randint(130, 255), rng.randint(100, 210),
                         rng.randint(80, 200)])
        fh = 0.62 * height
        fw = fh / 1.52  # eccentricity outside the training [1.1, 1.4]
    else:
        background = (rng.rand(height, width, 3) * 60 + rng.rand(3) * 120).astype(np.uint8)
        background = cv2.blur(background, (5, 5))
        skin = np.array([rng.randint(160, 230), rng.randint(120, 190), rng.randint(100, 170)])

        fh = 0.62 * height
        fw = fh / 1.25
    n = int(fps * duration)
    frames = np.zeros((n, height, width, 3), np.uint8)
    mouth_hz = gate_hz if mouth_gate_hz is None else mouth_gate_hz
    for i in range(n):
        t = i / fps
        gate = 0.5 * (1 + np.sin(2 * np.pi * mouth_hz * t))
        cx = width / 2 + 0.06 * width * np.sin(2 * np.pi * 0.05 * t)
        cy = height / 2 + 0.04 * height * np.cos(2 * np.pi * 0.07 * t)
        if pose_jitter > 0:
            cx += pose_jitter * rng.randn()
            cy += pose_jitter * rng.randn()
        frame = background.copy()
        pts = draw_face(frame, cx, cy, fw, fh, skin, aperture=gate)
        if heldout:  # accessories the training renderer never draws
            dark = tuple((skin * 0.3).astype(int).tolist())
            for base_i in (36, 42):  # glasses rings + bridge
                c = pts[base_i: base_i + 6].mean(axis=0).astype(int)
                cv2.circle(frame, tuple(c), max(3, int(fw * 0.12)), dark, 2)
            l = pts[36:42].mean(axis=0).astype(int)
            r = pts[42:48].mean(axis=0).astype(int)
            cv2.line(frame, tuple(l), tuple(r), dark, 2)
            cv2.ellipse(frame, (int(cx), int(cy - 0.1 * fh)),  # hair arc
                        (int(fw * 0.55), int(fh * 0.5)), 0, 180, 360, dark, -1)
        if texture_noise > 0:
            y0, y1 = int(cy - fh / 2), int(cy + fh / 2)
            x0, x1 = int(cx - fw / 2), int(cx + fw / 2)
            y0, x0 = max(y0, 0), max(x0, 0)
            region = frame[y0:y1, x0:x1].astype(np.float32)
            region += texture_noise * rng.randn(*region.shape)
            frame[y0:y1, x0:x1] = np.clip(region, 0, 255).astype(np.uint8)
        if sensor_noise > 0:
            noisy = frame.astype(np.float32) + sensor_noise * rng.randn(*frame.shape)
            frame = np.clip(noisy, 0, 255).astype(np.uint8)
        frames[i] = frame
    video_path = os.path.join(dirpath, f"{name}.mp4")
    write_video(video_path, frames, fps)

    if speech_text is not None:
        sig = gated_speech(speech_text, duration, gate_hz=gate_hz, sr=sr,
                           renderer=speech_renderer)
    else:
        t = np.arange(int(sr * duration)) / sr
        gate = (np.sin(2 * np.pi * gate_hz * t) > 0).astype(np.float32)
        sig = 0.5 * np.sin(2 * np.pi * 330 * t).astype(np.float32) * gate
    if audio_offset_s:
        sig = np.roll(sig, int(audio_offset_s * sr))
    write_wav(os.path.join(dirpath, f"{name}.wav"), sig, sr)
    return video_path


TONE_ALPHABET = "abcdefghijklmnopqrstuvwxyz "
TONE_SR = 16000
TONE_CHAR_S = 0.08
TONE_BASE_HZ = 300.0
TONE_STEP_HZ = 60.0


def tone_speech(text: str, rng: np.random.RandomState | None = None) -> np.ndarray:
    """Tone-coded 'speech': each character is a Hann-windowed sine on a
    frequency ladder. The training domain for the JAX ASR stack
    (tools/pretrain_asr.py) and the hermetic transcription fixture —
    the role Whisper audio plays in the reference (a2_vad_asr.py:27-30).
    """
    n = int(TONE_SR * TONE_CHAR_S)
    t = np.arange(n) / TONE_SR
    chunks = []
    for ch in text:
        k = TONE_ALPHABET.index(ch)
        f = TONE_BASE_HZ + k * TONE_STEP_HZ
        chunks.append(0.4 * np.sin(2 * np.pi * f * t) * np.hanning(n))
    audio = np.concatenate(chunks) if chunks else np.zeros(n)
    if rng is not None:
        audio = audio + 0.01 * rng.randn(len(audio))
    return audio.astype(np.float32)


def gated_speech(
    text: str,
    duration: float,
    gate_hz: float = 1.0,
    sr: int = TONE_SR,
    rng: np.random.RandomState | None = None,
    renderer: str = "tone",
) -> np.ndarray:
    """Tone-coded speech phrased into the gate's on-windows.

    Words are packed greedily into successive gate-on half-periods (the
    mouth-open phases of make_face_video's face), with silence between —
    the shape of real narrated video: speech bursts aligned with mouth
    motion, real pauses for VAD/pause_ratio, and every burst short enough
    to decode inside one trained ASR window.  Words that don't fit the
    remaining window wait for the next one; text beyond the clip is
    dropped.
    """
    if renderer.startswith("formant"):
        from fvd_tpu.models.synthetic_speech import PHONE_S, formant_speech

        char_s, render = PHONE_S, formant_speech
    else:
        char_s, render = TONE_CHAR_S, tone_speech
    n_total = int(sr * duration)
    audio = np.zeros(n_total, np.float32)
    on_s = 0.5 / gate_hz  # gate = sin(2*pi*gate_hz*t) > 0: first half-period
    period = 1.0 / gate_hz
    max_chars = min(int(on_s / char_s), 10)  # trained utterance length
    words = [w for w in text.split() if w]
    wi = 0
    k = 0
    while wi < len(words) and k * period < duration:
        phrase = ""
        while wi < len(words):
            cand = words[wi] if not phrase else f"{phrase} {words[wi]}"
            if len(cand) > max_chars:
                break
            phrase = cand
            wi += 1
        if phrase:
            a = render(phrase, rng)
            i0 = int(k * period * sr)
            i1 = min(i0 + len(a), n_total)
            audio[i0:i1] = a[: i1 - i0]
        else:
            # a word longer than any window: render it anyway, spilling past
            # the gate-on phase (slightly degraded sync beats silently
            # dropping content words from the transcript)
            a = render(words[wi][: max_chars + 4], rng)
            i0 = int(k * period * sr)
            i1 = min(i0 + len(a), n_total)
            audio[i0:i1] = a[: i1 - i0]
            wi += 1
        k += 1
    return audio


def _bright_boxes(frames: np.ndarray):
    """Vectorized bright-square bounding boxes over a frame batch.

    Returns (has, x1, y1, x2, y2) with inclusive int pixel extents.
    ``sum > 360`` on uint16 is exactly ``mean(axis=-1) > 120`` without the
    per-frame float materialization (the providers run per chunk inside the
    pipeline's hot loop; one batched pass keeps the 1-core host feeding the
    device).
    """
    frames = np.asarray(frames)
    if frames.dtype != np.uint8:  # the fast paths below assume uint8 frames
        frames = np.clip(frames, 0, 255).astype(np.uint8)
    # channel sum without numpy's slow tiny-last-axis reduce (7x faster)
    sums = frames[..., 0].astype(np.uint16)
    sums += frames[..., 1]
    sums += frames[..., 2]
    mask = sums > 360  # [B, H, W]
    rows = mask.any(axis=2)  # [B, H]
    cols = mask.any(axis=1)  # [B, W]
    has = rows.any(axis=1)
    y1 = rows.argmax(axis=1)
    y2 = rows.shape[1] - 1 - rows[:, ::-1].argmax(axis=1)
    x1 = cols.argmax(axis=1)
    x2 = cols.shape[1] - 1 - cols[:, ::-1].argmax(axis=1)
    return has, x1, y1, x2, y2


class SyntheticFaceDetector:
    """Finds the bright square — a deterministic FaceDetectorProvider."""

    model_name = "synthetic_blob"

    def detect_batch(self, frames: np.ndarray) -> List[List[FaceBox]]:
        has, x1, y1, x2, y2 = _bright_boxes(frames)
        return [
            [FaceBox(float(x1[i]), float(y1[i]),
                     float(x2[i] + 1), float(y2[i] + 1), 0.95)] if has[i] else []
            for i in range(len(has))
        ]


class SyntheticLandmarks:
    """68-point landmark + pose provider driven by the bright-square layout.

    Mouth aperture follows the configured gate so C1 sees a syncable MAR
    track; eyes get plausible EAR geometry; poses drift smoothly.
    """

    model_name = "synthetic_landmarks"

    def __init__(self, fps: float = 10.0, gate_hz: float = 1.0):
        self.fps = fps
        self.gate_hz = gate_hz
        self._call = 0

    def landmarks_batch(self, frames: np.ndarray,
                        device_frames=None) -> List[List[np.ndarray]]:
        """One vectorized pass over the batch (same arithmetic, same values,
        as the original per-frame formulation — the chunked-streaming and
        golden lip-sync tests pin the outputs). ``device_frames`` is unused:
        this fixture computes on host."""
        frames = np.asarray(frames)
        if frames.dtype != np.uint8:  # the mouth-strip range check is uint8
            frames = np.clip(frames, 0, 255).astype(np.uint8)
        b = len(frames)
        if b == 0:
            return []
        has, x1, y1, x2, y2 = _bright_boxes(frames)
        cx = (x1 + x2) / 2
        cy = (y1 + y2) / 2
        half = np.maximum((x2 - x1) / 2, 12)

        # aperture measured from the rendered mouth strip (content-based, so
        # chunked streaming sees identical landmarks regardless of batch
        # boundaries; the strip height encodes the gate). |v-60|<10 on uint8
        # == 51..69 inclusive; the wraparound subtract needs one pass.
        in_range = (frames - np.uint8(51)) <= np.uint8(18)
        mouth_mask = in_range[..., 0] & in_range[..., 1] & in_range[..., 2]
        strip = mouth_mask.any(axis=2)  # [B, H]
        has_strip = strip.any(axis=1)
        r1 = strip.argmax(axis=1)
        r2 = strip.shape[1] - 1 - strip[:, ::-1].argmax(axis=1)
        i = np.arange(b)
        gate = 0.5 * (1 + np.sin(2 * np.pi * self.gate_hz * (i / self.fps)))
        aperture = np.where(has_strip, 2 + (r2 - r1), 2 + 10 * gate)

        pts = np.zeros((b, 68, 2))
        ang = np.linspace(0, 2 * np.pi, 48, endpoint=False)
        pts[:, :48, 0] = cx[:, None] + 0.8 * half[:, None] * np.cos(ang)
        pts[:, :48, 1] = cy[:, None] + 0.8 * half[:, None] * np.sin(ang)
        ey = cy - 0.3 * half
        for base, ex in ((36, cx - 0.4 * half), (42, cx + 0.4 * half)):
            pts[:, base + 0] = np.stack([ex - 6, ey], axis=1)
            pts[:, base + 3] = np.stack([ex + 6, ey], axis=1)
            pts[:, base + 1] = np.stack([ex - 2, ey - 2], axis=1)
            pts[:, base + 2] = np.stack([ex + 2, ey - 2], axis=1)
            pts[:, base + 4] = np.stack([ex + 2, ey + 2], axis=1)
            pts[:, base + 5] = np.stack([ex - 2, ey + 2], axis=1)
        mcx, mcy = cx, cy + 0.5 * half
        outer = np.linspace(0, 2 * np.pi, 12, endpoint=False)
        pts[:, 48:60, 0] = mcx[:, None] + 12 * np.cos(outer)
        pts[:, 48:60, 1] = mcy[:, None] + aperture[:, None] * np.sin(outer)
        inner = np.linspace(0, 2 * np.pi, 8, endpoint=False)
        pts[:, 60:68, 0] = mcx[:, None] + 8 * np.cos(inner)
        pts[:, 60:68, 1] = mcy[:, None] + 0.7 * aperture[:, None] * np.sin(inner)
        return [[pts[k]] if has[k] else [] for k in range(b)]

    def pose_batch(self, crops: np.ndarray) -> np.ndarray:
        n = len(crops)
        idx = np.arange(self._call, self._call + n)
        self._call += n
        return np.stack(
            [10 + 2 * np.sin(idx / 5.0), (idx * 0.5) % 20.0, np.full(n, 5.0)], axis=1
        )


def hermetic_providers(fps: float = 10.0, gate_hz: float = 1.0):
    """Provider bundle with no network / no weights: real device kernels,
    deterministic everything else."""
    from fvd_tpu.providers import Providers
    from fvd_tpu.providers.asr import EnergyVAD

    return Providers(
        asr=EnergyVAD(),
        face_detector=SyntheticFaceDetector(),
        landmarks=SyntheticLandmarks(fps=fps, gate_hz=gate_hz),
    )
