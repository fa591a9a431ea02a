"""Closed-loop feedback rollout (UNet-6ch semantics, test.ipynb cell 8):
channel 5 of each input frame is replaced by the previous *prediction*."""

import jax
import jax.numpy as jnp
import numpy as np

from nasa_niswan_tpu.core.padding import crop_to_grid, pad_geo
from nasa_niswan_tpu.data.dataset import Normalizer
from nasa_niswan_tpu.rollout.autoregressive import make_feedback_rollout_fn

GRID = (12, 16)
PADDED = (16, 20)


def make_linear_apply():
    """A stand-in model: 1x1 'conv' returning a linear map of the input
    channels, so the expected closed-loop trajectory is computable in
    numpy."""
    w = jnp.asarray(np.linspace(0.1, 0.7, 6, dtype=np.float32))

    def apply(params, x_nhwc):  # (B, H, W, 6) -> (B, H, W, 1)
        del params
        return jnp.sum(x_nhwc * w, axis=-1, keepdims=True)

    return apply, np.asarray(w)


def test_feedback_loop_uses_own_predictions():
    apply, w = make_linear_apply()
    norm = Normalizer(
        x_mean=np.zeros(6, np.float32), x_std=np.ones(6, np.float32),
        y_mean=0.0, y_std=1.0,
    )
    rollout = make_feedback_rollout_fn(
        apply, norm, padded_shape=PADDED, grid_shape=GRID
    )
    rng = np.random.default_rng(0)
    forcings = rng.standard_normal((2, 4, 6, *GRID)).astype(np.float32)
    preds = np.asarray(rollout(None, jnp.asarray(forcings)))
    assert preds.shape == (2, 4, *GRID)

    # numpy oracle of the same loop
    feedback = forcings[:, 0, 5]
    for t in range(4):
        frame = forcings[:, t].copy()
        frame[:, 5] = feedback
        padded = np.asarray(pad_geo(frame, PADDED))
        out = np.einsum("bchw,c->bhw", padded, w)
        expect = np.asarray(crop_to_grid(out, GRID))
        np.testing.assert_allclose(preds[:, t], expect, atol=1e-5)
        feedback = expect  # y_std=1, y_mean=0 -> physical == normalized

    # and the trajectory must differ from pure teacher-forced inference
    # (after step 0 the feedback channel no longer matches ground truth)
    teacher = np.stack(
        [
            np.asarray(
                crop_to_grid(
                    np.einsum(
                        "bchw,c->bhw", np.asarray(pad_geo(forcings[:, t], PADDED)), w
                    ),
                    GRID,
                )
            )
            for t in range(4)
        ],
        axis=1,
    )
    assert not np.allclose(preds[:, 1:], teacher[:, 1:])


def test_predict_test_feedback_matches_single_scan():
    """The chunked CLI evaluator (evalx.evaluate.predict_test_feedback)
    carries the feedback frame across jitted chunks; it must equal the
    one-scan library rollout exactly, including across chunk boundaries
    and a padded tail (T=7 with chunk_steps=3)."""
    from types import SimpleNamespace

    from nasa_niswan_tpu.evalx.evaluate import predict_test_feedback

    apply, w = make_linear_apply()
    norm = Normalizer(
        x_mean=np.linspace(-0.2, 0.3, 6).astype(np.float32),
        x_std=np.linspace(0.8, 1.4, 6).astype(np.float32),
        y_mean=0.1, y_std=2.0,
    )
    rng = np.random.default_rng(1)
    frames = rng.standard_normal((7, 6, *GRID)).astype(np.float32)
    targets = rng.standard_normal((7, *GRID)).astype(np.float32)

    bundle = SimpleNamespace(
        apply=lambda params, state, x, *, training=False, rng=None: (
            apply(params, x), state
        )
    )
    ds = SimpleNamespace(
        feedback_stream=lambda: (frames, targets), normalizer=norm
    )
    out = predict_test_feedback(
        bundle, None, None, ds, padded_shape=PADDED, chunk_steps=3
    )
    one = make_feedback_rollout_fn(
        apply, norm, padded_shape=PADDED, grid_shape=GRID
    )
    ref = np.asarray(one(None, jnp.asarray(frames[None])))[0]
    np.testing.assert_allclose(out["PDs"], ref, atol=1e-5)
    np.testing.assert_array_equal(out["GTs"], targets)
