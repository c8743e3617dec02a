"""Optimizer factory: param groups, decay masking of fixed leaves."""

import jax
import jax.numpy as jnp
import numpy as np

from laudnet_tpu.train.optim import (is_frozen_path, is_masker_path,
                                     make_sgd, param_group_labels)


def _params():
    return {
        "t2t_stem": {
            "attn1": {
                "w": jnp.ones((4, 8), jnp.float32),
                "kqv": {"kernel": jnp.ones((8, 24), jnp.float32),
                        "bias": jnp.zeros((24,), jnp.float32)},
            }
        },
        "block_0": {
            "token_policy": {"kernel": jnp.ones((8, 2), jnp.float32)},
            "fc1": {"kernel": jnp.ones((8, 16), jnp.float32)},
            # a non-performer leaf named 'w' must NOT be treated as frozen
            "w": jnp.ones((4,), jnp.float32),
        },
    }


def test_group_labels_split_maskers():
    labels = param_group_labels(_params())
    assert labels["block_0"]["token_policy"]["kernel"] == "masker"
    assert labels["block_0"]["fc1"]["kernel"] == "backbone"
    assert labels["t2t_stem"]["attn1"]["w"] == "backbone"


def test_frozen_performer_features_not_decayed():
    """The T2T performer's fixed random-feature matrix 'w' must not move
    under weight decay (its grad is stop_gradient-zeroed, but decay is
    gradient-independent — r4 fix). Trainable weights DO decay."""
    params = _params()
    opt = make_sgd(params, weight_decay=0.1, momentum=0.0, nesterov=False)
    state = opt.init(params)
    state.hyperparams["learning_rate"] = 1.0
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    updates, _ = opt.update(zeros, state, params)
    np.testing.assert_array_equal(
        np.asarray(updates["t2t_stem"]["attn1"]["w"]), 0.0)
    # trainable leaf: update = -lr * wd * p = -0.1
    np.testing.assert_allclose(
        np.asarray(updates["t2t_stem"]["attn1"]["kqv"]["kernel"]), -0.1,
        rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(updates["block_0"]["token_policy"]["kernel"]), -0.1,
        rtol=1e-6)


def test_is_frozen_path_only_matches_w_leaves():
    paths = []
    jax.tree_util.tree_map_with_path(
        lambda p, _: paths.append((tuple(str(getattr(k, "key", k))
                                         for k in p), is_frozen_path(p))),
        _params())
    frozen = [p for p, f in paths if f]
    assert frozen == [("t2t_stem", "attn1", "w")]


def test_rmsprop_matches_torch_semantics():
    """make_rmsprop reproduces torch.optim.RMSprop(alpha=0.9, momentum,
    weight_decay) stepwise on a toy param (the reference's --optimizer
    RMSprop, utils/optimizer.py:18-22)."""
    import numpy as np
    import torch

    from laudnet_tpu.train.optim import make_rmsprop

    w0 = np.array([[1.0, -2.0], [0.5, 3.0]], np.float32)
    # Second case is O(1e-5) gradients with wd=0: torch divides by
    # sqrt(nu)+eps while optax's default eps_in_sqrt=True divides by
    # sqrt(nu+eps) — at |g|~1e-5 those differ by >10x in step size, so
    # the tiny-gradient case exercises the eps_in_sqrt=False fix.
    cases = [
        (0.05, [np.array([[0.1, -0.2], [0.3, 0.05]], np.float32),
                np.array([[-0.4, 0.1], [0.2, -0.1]], np.float32)]),
        (0.0, [np.array([[1e-5, -2e-5], [3e-5, -1e-5]], np.float32),
               np.array([[-1e-5, 1e-5], [2e-5, 2e-5]], np.float32)]),
    ]
    lr, mom = 0.01, 0.9

    for wd, g_seq in cases:
        tw = torch.nn.Parameter(torch.tensor(w0))
        topt = torch.optim.RMSprop([tw], lr=lr, alpha=0.9, momentum=mom,
                                   weight_decay=wd, eps=1e-8)
        for g in g_seq:
            tw.grad = torch.tensor(g)
            topt.step()

        params = {"layer1_0": {"conv1": {"kernel": jnp.asarray(w0)}}}
        opt = make_rmsprop(params, momentum=mom, weight_decay=wd)
        state = opt.init(params)
        state.hyperparams["learning_rate"] = lr
        p = params
        for g in g_seq:
            grads = {"layer1_0": {"conv1": {"kernel": jnp.asarray(g)}}}
            updates, state = opt.update(grads, state, p)
            p = jax.tree_util.tree_map(lambda a, u: a + u, p, updates)
        np.testing.assert_allclose(
            np.asarray(p["layer1_0"]["conv1"]["kernel"]),
            tw.detach().numpy(), rtol=1e-5, atol=1e-7,
            err_msg=f"wd={wd}")


def test_weights_only_decay_mask():
    """decay_weights_only: rank>1 kernels decay; biases/scales do not
    (reference get_parameters grouping)."""
    import numpy as np

    from laudnet_tpu.train.optim import make_sgd

    params = {"layer1_0": {
        "conv1": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones((2,))},
    }}
    opt = make_sgd(params, momentum=0.0, nesterov=False, weight_decay=0.1,
                   decay_weights_only=True)
    state = opt.init(params)
    state.hyperparams["learning_rate"] = 1.0
    zero = jax.tree_util.tree_map(jnp.zeros_like, params)
    updates, _ = opt.update(zero, state, params)
    # kernel decays by wd * p * lr; bias update is exactly zero
    np.testing.assert_allclose(
        np.asarray(updates["layer1_0"]["conv1"]["kernel"]), -0.1)
    np.testing.assert_allclose(
        np.asarray(updates["layer1_0"]["conv1"]["bias"]), 0.0)
