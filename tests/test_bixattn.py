"""BiXAttn block tests: shapes, mask semantics, shared-logit symmetry."""

import numpy as np
import jax
import jax.numpy as jnp

from cape_tpu.models.bixattn import BiXAttn, BiXAttnBlock, CAOneSidedBlock


def setup(module, x, y, **kw):
    params = module.init(jax.random.PRNGKey(0), x, y, **kw)
    return lambda *a, **k: module.apply(params, *a, **k)


class TestBiXAttn:
    def test_shapes(self):
        m = BiXAttn(dim=32, num_heads=4)
        x = jnp.ones((2, 5, 32))
        y = jnp.ones((2, 7, 32))
        fn = setup(m, x, y)
        ox, oy = fn(x, y)
        assert ox.shape == (2, 5, 32) and oy.shape == (2, 7, 32)

    def test_masked_y_does_not_leak_into_x(self):
        m = BiXAttn(dim=16, num_heads=2)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(1, 4, 16)), jnp.float32)
        y = jnp.asarray(rng.normal(size=(1, 6, 16)), jnp.float32)
        mask = jnp.zeros((1, 6), bool).at[:, 4:].set(True)
        fn = setup(m, x, y, y_mask=mask)
        ox1, _ = fn(x, y, y_mask=mask)
        y2 = y.at[:, 4:].set(99.0)  # mutate only masked slots
        ox2, _ = fn(x, y2, y_mask=mask)
        np.testing.assert_allclose(np.asarray(ox1), np.asarray(ox2), atol=1e-5)

    def test_block_and_onesided(self):
        x = jnp.ones((2, 5, 32))
        y = jnp.ones((2, 7, 32))
        b = BiXAttnBlock(dim=32, num_heads=4)
        fn = setup(b, x, y)
        ox, oy = fn(x, y)
        assert ox.shape == x.shape and oy.shape == y.shape
        c = CAOneSidedBlock(dim=32, num_heads=4)
        fn2 = setup(c, x, y)
        ox, oy = fn2(x, y)
        assert ox.shape == x.shape
        np.testing.assert_array_equal(np.asarray(oy), np.asarray(y))
