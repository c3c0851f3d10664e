"""Loss parity vs golden values computed by the PyTorch reference."""

import numpy as np
import pytest

from tests.conftest import FIXTURE_DIR
from tests.test_torch_parity import _ensure_fixtures

pytestmark = pytest.mark.skipif(
    not _ensure_fixtures(), reason="torch reference fixtures unavailable"
)


@pytest.fixture(scope="module")
def goldens():
    return np.load(FIXTURE_DIR / "loss_parity.npz")


def test_triplet_loss_parity(goldens):
    import jax.numpy as jnp

    from video_fingerprint_tpu.ops.losses import triplet_loss

    all_emb = jnp.concatenate(
        [goldens[k] for k in ["emb_full_1", "emb_full_2", "emb_ex_1", "emb_ex_2"]]
    )
    all_ids = jnp.concatenate([jnp.asarray(goldens["video_ids"])] * 4)
    loss, n = triplet_loss(all_emb, all_ids, margin=0.3)
    np.testing.assert_allclose(float(loss), goldens["triplet_loss"], rtol=2e-3)
    assert int(n) == int(goldens["num_triplets"])


def test_triplet_loss_no_positives(goldens):
    import jax.numpy as jnp

    from video_fingerprint_tpu.ops.losses import triplet_loss

    emb = jnp.asarray(goldens["emb_full_1"])
    ids = jnp.arange(emb.shape[0])
    loss, n = triplet_loss(emb, ids)
    assert float(loss) == pytest.approx(float(goldens["triplet_loss_nopos"]))
    assert int(n) == int(goldens["num_triplets_nopos"]) == 0


def test_attention_loss_terms_parity(goldens):
    import jax.numpy as jnp

    from video_fingerprint_tpu.ops.losses import attention_contrastive_loss

    out = attention_contrastive_loss(
        jnp.asarray(goldens["emb_full_1"]),
        jnp.asarray(goldens["emb_full_2"]),
        jnp.asarray(goldens["emb_ex_1"]),
        jnp.asarray(goldens["emb_ex_2"]),
        temperature=jnp.asarray(goldens["temperature"]),
        video_ids=jnp.asarray(goldens["video_ids"]),
    )
    # fixture stores the unhalved sums; compute_loss reports term/2
    np.testing.assert_allclose(float(out["loss_full"]) * 2, goldens["loss_full"], rtol=2e-3)
    np.testing.assert_allclose(
        float(out["loss_extract"]) * 2, goldens["loss_extract"], rtol=2e-3
    )
    np.testing.assert_allclose(
        float(out["loss_extract_cross"]) * 2, goldens["loss_extract_cross"], rtol=2e-3
    )
    # total normalization: (full + 0.5ex + 0.3cross + 0.3triplet)/3.9
    expected = (
        goldens["loss_full"]
        + 0.5 * goldens["loss_extract"]
        + 0.3 * goldens["loss_extract_cross"]
        + 0.3 * goldens["triplet_loss"]
    ) / 3.9
    np.testing.assert_allclose(float(out["loss"]), expected, rtol=2e-3)


def test_cnn3d_loss_terms_parity(goldens):
    import jax.numpy as jnp

    from video_fingerprint_tpu.ops.losses import cnn3d_contrastive_loss

    out = cnn3d_contrastive_loss(
        jnp.asarray(goldens["emb_full_1"]),
        jnp.asarray(goldens["emb_full_2"]),
        temperature=jnp.asarray(goldens["temperature"]),
        video_ids=None,
        use_triplet=False,
    )
    np.testing.assert_allclose(
        float(out["loss_standard"]), goldens["loss3d_standard"], rtol=2e-3
    )
    np.testing.assert_allclose(float(out["loss_hard"]), goldens["loss3d_hard"], rtol=2e-3)


def test_triplet_loss_is_differentiable():
    import jax
    import jax.numpy as jnp

    from video_fingerprint_tpu.ops.losses import triplet_loss

    emb = jax.random.normal(jax.random.PRNGKey(0), (8, 16))
    # duplicate row -> zero distance inside a positive pair
    emb = emb.at[1].set(emb[0])
    ids = jnp.asarray([0, 0, 1, 1, 2, 2, 3, 3])
    grad = jax.grad(lambda e: triplet_loss(e, ids)[0])(emb)
    assert np.isfinite(np.asarray(grad)).all()
