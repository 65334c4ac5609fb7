"""Time-recurrent signal filters as lax.scan programs.

The reference smooths landmark and pose tracks with a OneEuroFilter object
mutated per frame (``v3_mouth_landmarks_timeseries.py:9-46``,
``v4_blink_headpose_dynamics.py:11-48``) inside its Python frame loops.
Here the identical math runs as ONE ``lax.scan`` over the whole track —
vectorized across all landmark coordinates — with a validity mask so frames
where tracking lost the face pass filter state through untouched (exactly
what the reference's "filter not called this frame" does).

Also: IoU with the reference's +1 pixel convention (v3:48-61).
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
import numpy as np


def iou(box_a, box_b) -> float:
    """IoU with inclusive-pixel (+1) areas — reference calculate_iou
    (v3:48-61 / v4:90-103)."""
    xA = max(box_a[0], box_b[0])
    yA = max(box_a[1], box_b[1])
    xB = min(box_a[2], box_b[2])
    yB = min(box_a[3], box_b[3])
    inter = max(0, xB - xA + 1) * max(0, yB - yA + 1)
    area_a = (box_a[2] - box_a[0] + 1) * (box_a[3] - box_a[1] + 1)
    area_b = (box_b[2] - box_b[0] + 1) * (box_b[3] - box_b[1] + 1)
    return inter / float(area_a + area_b - inter)


@partial(jax.jit, static_argnames=("min_cutoff", "beta", "d_cutoff"))
def one_euro_scan(
    times: jax.Array,
    values: jax.Array,
    valid: jax.Array,
    min_cutoff: float = 1.0,
    beta: float = 0.0,
    d_cutoff: float = 1.0,
) -> jax.Array:
    """OneEuroFilter over a track.

    times: [T]; values: [T, ...]; valid: [T] bool.  Output [T, ...]:
    * the first valid frame initializes the filter and passes through raw
      (reference v3:204-209: ``smoothed = raw`` on init);
    * subsequent valid frames apply the filter with t_e measured from the
      previous *valid* frame;
    * invalid frames leave state untouched and output NaN (callers mask).
    """
    values = values.astype(jnp.float32)
    times = times.astype(jnp.float32)

    def sf(t_e, cutoff):
        r = 2.0 * jnp.pi * cutoff * t_e
        return r / (r + 1.0)

    def step(carry, inp):
        initialized, t_prev, x_prev, dx_prev = carry
        t, x, ok = inp

        t_e = t - t_prev
        safe_te = jnp.where(t_e != 0, t_e, 1.0)
        a_d = sf(safe_te, d_cutoff)
        dx = (x - x_prev) / safe_te
        dx_hat = a_d * dx + (1.0 - a_d) * dx_prev
        cutoff = min_cutoff + beta * jnp.abs(dx_hat)
        a = sf(safe_te, cutoff)
        x_hat = a * x + (1.0 - a) * x_prev

        # first valid frame: initialize, output raw
        out_init = x
        new_carry_init = (jnp.bool_(True), t, x, jnp.zeros_like(x))
        # subsequent valid frame: filter
        new_carry_filt = (jnp.bool_(True), t, x_hat, dx_hat)

        use_init = jnp.logical_and(ok, jnp.logical_not(initialized))
        use_filt = jnp.logical_and(ok, initialized)

        out = jnp.where(use_init, out_init, jnp.where(use_filt, x_hat, jnp.nan))
        new_carry = jax.tree.map(
            lambda i, f, keep: jnp.where(use_init, i, jnp.where(use_filt, f, keep)),
            new_carry_init,
            new_carry_filt,
            carry,
        )
        return new_carry, out

    init = (
        jnp.bool_(False),
        jnp.float32(0.0),
        jnp.zeros_like(values[0]),
        jnp.zeros_like(values[0]),
    )
    _, out = jax.lax.scan(step, init, (times, values, valid))
    return out


def one_euro_init_carry(value_shape, dtype=jnp.float32):
    """Fresh (uninitialized) filter carry for the chunked scan."""
    zero = jnp.zeros(value_shape, dtype)
    return (jnp.bool_(False), jnp.float32(0.0), zero, zero)


@partial(jax.jit, static_argnames=("min_cutoff", "beta", "d_cutoff"))
def one_euro_scan_chunk(
    carry,
    times: jax.Array,
    values: jax.Array,
    valid: jax.Array,
    min_cutoff: float = 1.0,
    beta: float = 0.0,
    d_cutoff: float = 1.0,
):
    """Chunk-resumable variant of :func:`one_euro_scan`: takes and returns
    the filter carry so long videos can be smoothed chunk by chunk with
    bounded memory, bit-identical to one whole-track scan (tested)."""
    values = values.astype(jnp.float32)
    times = times.astype(jnp.float32)

    def sf(t_e, cutoff):
        r = 2.0 * jnp.pi * cutoff * t_e
        return r / (r + 1.0)

    def step(carry, inp):
        initialized, t_prev, x_prev, dx_prev = carry
        t, x, ok = inp
        t_e = t - t_prev
        safe_te = jnp.where(t_e != 0, t_e, 1.0)
        a_d = sf(safe_te, d_cutoff)
        dx = (x - x_prev) / safe_te
        dx_hat = a_d * dx + (1.0 - a_d) * dx_prev
        cutoff = min_cutoff + beta * jnp.abs(dx_hat)
        a = sf(safe_te, cutoff)
        x_hat = a * x + (1.0 - a) * x_prev

        out_init = x
        new_carry_init = (jnp.bool_(True), t, x, jnp.zeros_like(x))
        new_carry_filt = (jnp.bool_(True), t, x_hat, dx_hat)
        use_init = jnp.logical_and(ok, jnp.logical_not(initialized))
        use_filt = jnp.logical_and(ok, initialized)
        out = jnp.where(use_init, out_init, jnp.where(use_filt, x_hat, jnp.nan))
        new_carry = jax.tree.map(
            lambda i, f, keep: jnp.where(use_init, i, jnp.where(use_filt, f, keep)),
            new_carry_init, new_carry_filt, carry,
        )
        return new_carry, out

    carry, out = jax.lax.scan(step, carry, (times, values, valid))
    return out, carry


@partial(
    jax.jit,
    static_argnames=("lm_min_cutoff", "lm_beta", "pose_min_cutoff", "pose_beta"),
)
def v4_smooth_chunk(
    lm_carry,
    pose_carry,
    times: jax.Array,
    lm_track: jax.Array,
    lm_valid: jax.Array,
    pose_track: jax.Array,
    pose_valid: jax.Array,
    lm_min_cutoff: float = 0.5,
    lm_beta: float = 0.1,
    pose_min_cutoff: float = 0.1,
    pose_beta: float = 0.1,
):
    """Chunk-resumable V4 smoothing stage (one dispatch per chunk):
    landmark OneEuro + EAR + pose OneEuro, with carried filter states."""
    sm_lm, lm_carry = one_euro_scan_chunk(
        lm_carry, times, lm_track, lm_valid,
        min_cutoff=lm_min_cutoff, beta=lm_beta,
    )
    sm_pose, pose_carry = one_euro_scan_chunk(
        pose_carry, times, pose_track, pose_valid,
        min_cutoff=pose_min_cutoff, beta=pose_beta,
    )

    def ear_of(eye):  # [T, 6, D]
        A = jnp.linalg.norm(eye[:, 1] - eye[:, 5], axis=-1)
        B = jnp.linalg.norm(eye[:, 2] - eye[:, 4], axis=-1)
        C = jnp.linalg.norm(eye[:, 0] - eye[:, 3], axis=-1)
        return jnp.where(C > 0, (A + B) / (2.0 * C), 0.0)

    ears = (ear_of(sm_lm[:, 36:42]) + ear_of(sm_lm[:, 42:48])) / 2.0
    return sm_lm, ears, sm_pose, lm_carry, pose_carry


@partial(
    jax.jit,
    static_argnames=("lm_min_cutoff", "lm_beta", "pose_min_cutoff", "pose_beta"),
)
def v4_smooth_program(
    times: jax.Array,
    lm_track: jax.Array,     # [T, 68, D]
    lm_valid: jax.Array,     # [T]
    pose_track: jax.Array,   # [T, 3]
    pose_valid: jax.Array,   # [T]
    lm_min_cutoff: float = 0.5,
    lm_beta: float = 0.1,
    pose_min_cutoff: float = 0.1,
    pose_beta: float = 0.1,
):
    """V4's whole smoothing stage in ONE dispatch: landmark OneEuro, EAR per
    frame (eyes 36:48, reference v4:260-264), and pose OneEuro."""
    sm_lm = one_euro_scan(times, lm_track, lm_valid,
                          min_cutoff=lm_min_cutoff, beta=lm_beta)
    sm_pose = one_euro_scan(times, pose_track, pose_valid,
                            min_cutoff=pose_min_cutoff, beta=pose_beta)

    def ear_of(eye):  # [T, 6, D]
        A = jnp.linalg.norm(eye[:, 1] - eye[:, 5], axis=-1)
        B = jnp.linalg.norm(eye[:, 2] - eye[:, 4], axis=-1)
        C = jnp.linalg.norm(eye[:, 0] - eye[:, 3], axis=-1)
        return jnp.where(C > 0, (A + B) / (2.0 * C), 0.0)

    ears = (ear_of(sm_lm[:, 36:42]) + ear_of(sm_lm[:, 42:48])) / 2.0
    return sm_lm, ears, sm_pose


class OneEuroFilter:
    """Stateful host-side reference implementation (identical math) for
    call-at-a-time use and for testing the scan against."""

    def __init__(self, t0, x0, dx0=0.0, min_cutoff=1.0, beta=0.0, d_cutoff=1.0):
        self.min_cutoff = float(min_cutoff)
        self.beta = float(beta)
        self.d_cutoff = float(d_cutoff)
        self.x_prev = np.asarray(x0, dtype=float)
        self.dx_prev = np.asarray(dx0, dtype=float) * np.ones_like(self.x_prev)
        self.t_prev = float(t0)

    @staticmethod
    def _sf(t_e, cutoff):
        r = 2 * np.pi * cutoff * t_e
        return r / (r + 1)

    def __call__(self, t, x):
        x = np.asarray(x, dtype=float)
        t_e = t - self.t_prev
        a_d = self._sf(t_e, self.d_cutoff)
        dx = (x - self.x_prev) / t_e
        dx_hat = a_d * dx + (1 - a_d) * self.dx_prev
        cutoff = self.min_cutoff + self.beta * np.abs(dx_hat)
        a = self._sf(t_e, cutoff)
        x_hat = a * x + (1 - a) * self.x_prev
        self.x_prev = x_hat
        self.dx_prev = dx_hat
        self.t_prev = t
        return x_hat


def eye_aspect_ratio(eye: np.ndarray) -> float:
    """EAR over 6 eye landmarks (reference v4:50-55); works for 2D or 3D."""
    eye = np.asarray(eye, dtype=float)
    A = np.linalg.norm(eye[1] - eye[5])
    B = np.linalg.norm(eye[2] - eye[4])
    C = np.linalg.norm(eye[0] - eye[3])
    return float((A + B) / (2.0 * C)) if C > 0 else 0.0
