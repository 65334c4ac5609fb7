"""Provider bundle factories.

``production_providers`` assembles the best available implementation for
each seam:

* vision models from ``checkpoints/*.npz`` when present (see
  tools/pretrain_synthetic.py), random-init JAX models otherwise;
* LLM/search backends when credentials exist (OPENAI_API_KEY,
  SERPER_API_KEY/GOOGLE_API_KEY) — mirroring how the reference degrades
  without keys;
* the JAX text encoder for evidence ranking, EnergyVAD for speech segments
  (a converted Whisper checkpoint upgrades A2 via ``asr_checkpoint``).
"""

from __future__ import annotations

import os

from fvd_tpu.providers import Providers
from fvd_tpu.providers.asr import EnergyVAD
from fvd_tpu.providers.llm import NullLLM, OpenAILLM
from fvd_tpu.providers.search import default_chain


def _build_ocr(det_ckpt: str, rec_ckpt: str):
    import jax

    from fvd_tpu.models import encoders, ocr

    det_params = rec_params = None
    det_width, det_arch = 16, "v1"
    if os.path.exists(det_ckpt):
        det_params, det_width, det_arch = ocr.load_detector(det_ckpt)
    if os.path.exists(rec_ckpt):
        template = ocr.init_recognizer(jax.random.PRNGKey(0), width=32)
        rec_params = encoders.load_params(rec_ckpt, template)
    return ocr.JaxOCR(det_params=det_params, rec_params=rec_params,
                      det_width=det_width, det_arch=det_arch)


KNOWN_CHECKPOINTS = (
    "face_ssd.npz", "landmarks.npz", "pose.npz", "clip.npz", "asr.npz",
    "ocr_rec.npz", "ocr_det.npz", "text_encoder.npz", "hf",
)


def _has_checkpoints(path: str) -> bool:
    return any(os.path.exists(os.path.join(path, f)) for f in KNOWN_CHECKPOINTS)


def default_checkpoint_dir() -> str:
    """Checkpoint search order: $FVD_CHECKPOINT_DIR, ./checkpoints (only when
    it actually holds fvd checkpoints — an unrelated same-named directory
    must not shadow the trained weights), then the repo-root checkpoints/
    next to the package (the CLI can run from any cwd).
    """
    env = os.environ.get("FVD_CHECKPOINT_DIR")
    if env:
        return env
    if os.path.isdir("checkpoints") and _has_checkpoints("checkpoints"):
        return "checkpoints"
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(repo_root, "checkpoints")


def asr_speech_domain(checkpoint_dir: str) -> str:
    """The speech domain ("formant" | "tone") of the ASR checkpoint
    production_providers will load — synthetic-media generators use this to
    render audio the shipped ASR can actually transcribe."""
    import json

    for name in ("asr_formant", "asr"):
        npz = os.path.join(checkpoint_dir, name + ".npz")
        meta = os.path.join(checkpoint_dir, name + ".json")
        if os.path.exists(npz):
            try:
                with open(meta) as f:
                    return json.load(f).get("domain", "tone")
            except Exception:
                return "tone"
    return "tone"


def bootstrap_production(use_llm: bool = True, use_search: bool = True) -> Providers:
    """Install the production bundle as the process default unless a caller
    already installed one via set_providers() (entry points call this; tests
    and embedders that inject their own bundle keep it).
    """
    from fvd_tpu.providers import get_providers, providers_installed, set_providers

    if providers_installed():
        return get_providers()
    ckpt_dir = default_checkpoint_dir()
    print(f"providers: checkpoints from {os.path.abspath(ckpt_dir)}")
    return set_providers(
        production_providers(ckpt_dir, use_llm=use_llm, use_search=use_search)
    )


def production_providers(
    checkpoint_dir: str = "checkpoints",
    use_llm: bool = True,
    use_search: bool = True,
    recorded_services: bool = False,
) -> Providers:
    """``recorded_services``: replace the network LLM/search seams with the
    deterministic recorded fixtures (providers/recorded.py) so the full
    C3->E1->E2->E3 + V5 half of the DAG runs hermetically — the same seams
    the reference's tests mock (test_c3_openai_primary.py:13-37)."""
    import jax

    from fvd_tpu.models import encoders, face_ssd, landmarks_fan, ocr

    ssd_ckpt = os.path.join(checkpoint_dir, "face_ssd.npz")
    lmk_ckpt = os.path.join(checkpoint_dir, "landmarks.npz")
    clip_ckpt = os.path.join(checkpoint_dir, "clip.npz")
    text_ckpt = os.path.join(checkpoint_dir, "text_encoder.npz")
    ocr_rec_ckpt = os.path.join(checkpoint_dir, "ocr_rec.npz")
    ocr_det_ckpt = os.path.join(checkpoint_dir, "ocr_det.npz")

    detector = face_ssd.SSDFaceDetector(
        checkpoint=ssd_ckpt if os.path.exists(ssd_ckpt) else None
    )
    lmk_params = None
    if os.path.exists(lmk_ckpt):
        template = landmarks_fan.init_landmark_params(jax.random.PRNGKey(1), width=32)
        lmk_params = landmarks_fan.load_params(lmk_ckpt, template)
        lmk_width = 32
    else:
        lmk_width = 64
    pose_ckpt = os.path.join(checkpoint_dir, "pose.npz")
    pose_params = None
    pose_width = 32
    if os.path.exists(pose_ckpt):
        pose_meta = pose_ckpt.replace(".npz", ".json")
        if os.path.exists(pose_meta):
            import json

            with open(pose_meta) as f:
                pose_width = int(json.load(f).get("width", 32))
        template = landmarks_fan.init_pose_params(jax.random.PRNGKey(2),
                                                  width=pose_width)
        pose_params = landmarks_fan.load_params(pose_ckpt, template)
    landmarks = landmarks_fan.FANLandmarks(
        detector, landmark_params=lmk_params, pose_params=pose_params,
        width=lmk_width, pose_width=pose_width,
    )

    if recorded_services:
        from fvd_tpu.providers.recorded import RecordedLLM

        llm = RecordedLLM()
    else:
        llm = OpenAILLM() if use_llm else NullLLM()
        if not getattr(llm, "available", False):
            llm = NullLLM()

    # Weight-compatible HF Flax providers take precedence when the exact
    # reference checkpoints were imported (tools/import_hf_weights.py).
    text_encoder = None
    clip = None
    asr = None
    hf_dir = os.path.join(checkpoint_dir, "hf")
    if os.path.isdir(hf_dir):
        from fvd_tpu.providers import hf_models

        def _try(kind, loader):
            path = os.path.join(hf_dir, kind)
            if os.path.isdir(path):
                try:
                    return loader(path)
                except Exception as e:
                    print(f"providers: failed to load HF {kind}: {e}")
            return None

        text_encoder = _try("minilm", hf_models.HFTextEncoder.from_local)
        clip = _try("clip", hf_models.HFClip.from_local)
        asr = _try("whisper", hf_models.HFWhisperASR.from_local)

    # Without trained weights, a random-init transformer embedding is worse
    # than the deterministic lexical hashing encoder for evidence ranking,
    # and a random CLIP produces meaningless consistency scores — C2 skips
    # entirely (the reference's model-load-failure behavior) rather than
    # emit noise.
    if text_encoder is None:
        if os.path.exists(text_ckpt):
            import json

            meta = {}
            sidecar = text_ckpt.replace(".npz", ".json")
            if os.path.exists(sidecar):
                with open(sidecar) as fh:
                    meta = json.load(fh)
            text_encoder = encoders.JaxTextEncoder(
                checkpoint=text_ckpt,
                dim=int(meta.get("dim", 192)),
                depth=int(meta.get("depth", 6)),
                out_dim=int(meta.get("out_dim", 256)),
            )
        else:
            from fvd_tpu.providers.encoders import HashingTextEncoder

            text_encoder = HashingTextEncoder()
    if clip is None and os.path.exists(clip_ckpt):
        import json

        meta_path = clip_ckpt.replace(".npz", ".json")
        kwargs = {}
        if os.path.exists(meta_path):
            import inspect

            with open(meta_path) as f:
                meta = json.load(f)
            # sidecars may carry extra bookkeeping fields; take only what
            # the constructor knows
            accepted = set(inspect.signature(encoders.JaxClip.__init__).parameters)
            kwargs = {k: v for k, v in meta.items() if k in accepted}
        clip = encoders.JaxClip(checkpoint=clip_ckpt, **kwargs)
    # formant-domain checkpoint preferred: speech-structured audio (the
    # closest no-external-weights analog of Whisper's domain) over the
    # tone-coded alphabet; both decode through the same VAD-windowed stack
    for asr_name in ("asr_formant.npz", "asr.npz"):
        asr_ckpt = os.path.join(checkpoint_dir, asr_name)
        if asr is None and os.path.exists(asr_ckpt):
            from fvd_tpu.models.asr import JaxASR

            asr = JaxASR.from_checkpoint(asr_ckpt)
            break

    if recorded_services:
        from fvd_tpu.providers.recorded import RecordedSearch

        search = RecordedSearch()
    else:
        search = default_chain() if use_search else Providers().search

    return Providers(
        llm=llm,
        search=search,
        text_encoder=text_encoder,
        clip=clip,
        asr=asr or EnergyVAD(),
        ocr=_build_ocr(ocr_det_ckpt, ocr_rec_ckpt),
        face_detector=detector,
        landmarks=landmarks,
    )
