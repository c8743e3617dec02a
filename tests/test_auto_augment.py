"""AutoAugment vs the reference engine (timm vendored at
`/root/reference/imagenet_classification/utils/auto_augment.py`) as a
pixel-level oracle (VERDICT r1 weak #7 / next #10)."""

import importlib.util
import random

import numpy as np
import pytest
from PIL import Image

REF_PATH = "/root/reference/imagenet_classification/utils/auto_augment.py"


@pytest.fixture(scope="module")
def ref():
    spec = importlib.util.spec_from_file_location("ref_auto_augment", REF_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture()
def img():
    rng = np.random.default_rng(0)
    return Image.fromarray(
        rng.integers(0, 256, (64, 48, 3), dtype=np.uint8), "RGB"
    )


def assert_pixel_equal(a, b, msg=""):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=msg)


def test_full_transform_pixel_identical_to_reference(ref, img):
    """Same seed => pixel-identical output: our engine consumes RNG in the
    reference's exact order (sub-policy choice, prob draws, magnitude
    negation, interpolation choice)."""
    from laudnet_tpu.data.auto_augment import auto_augment_transform

    ref_t = ref.auto_augment_transform(img_size=224)
    our_t = auto_augment_transform("v0")
    for seed in range(40):
        random.seed(seed)
        want = ref_t(img)
        random.seed(seed)
        got = our_t(img, random)
        assert_pixel_equal(got, want, f"seed {seed}")


def test_original_policy_ops_pixel_equal(ref, img):
    """Every (op, level) used by the 'original' policy matches the reference
    primitive at the same converted magnitude (both negation branches)."""
    from laudnet_tpu.data import auto_augment as ours

    used = sorted({(op, lvl) for sp in ours.IMAGENET_POLICY_ORIGINAL
                   for op, _, lvl in sp})
    for op, lvl in used:
        ref_op = ref.AugmentOp(op, prob=1.0, magnitude=lvl,
                               hparams=dict(img_mean=ours.IMAGENET_FILL,
                                            interpolation=Image.BILINEAR))
        for seed in (0, 1, 2, 3):
            random.seed(seed)
            want = ref_op(img)
            random.seed(seed)
            arg = ours.magnitude_to_arg(op, lvl, random)
            if op in ours._GEOMETRIC:
                got = ours.OPS[op](img, arg, ours.IMAGENET_FILL,
                                   Image.BILINEAR)
            else:
                got = ours.OPS[op](img, arg)
            assert_pixel_equal(got, want, f"{op} level {lvl} seed {seed}")


def test_v0_policy_program_matches_reference(ref):
    """The (name, prob, level) program of our v0/original policies equals the
    reference's policy tables."""
    from laudnet_tpu.data import auto_augment as ours

    hp = dict(ref._HPARAMS_DEFAULT)
    for name, table in (("v0", ours.IMAGENET_POLICY_V0),
                        ("original", ours.IMAGENET_POLICY_ORIGINAL)):
        ref_policy = ref.auto_augment_policy(name, hparams=hp)
        assert len(ref_policy) == len(table)
        for ref_sp, our_sp in zip(ref_policy, table):
            got = [(o.aug_fn.__name__, o.prob, o.magnitude)
                   for o in ref_sp]
            want = []
            for op, prob, lvl in our_sp:
                fn_name = {
                    "ShearX": "shear_x", "ShearY": "shear_y",
                    "TranslateXRel": "translate_x_rel",
                    "TranslateYRel": "translate_y_rel",
                    "Rotate": "rotate", "Color": "color",
                    "Contrast": "contrast", "Brightness": "brightness",
                    "Sharpness": "sharpness", "Posterize": "posterize",
                    "PosterizeOriginal": "posterize",
                    "Solarize": "solarize", "SolarizeAdd": "solarize_add",
                    "AutoContrast": "auto_contrast", "Equalize": "equalize",
                    "Invert": "invert",
                }[op]
                want.append((fn_name, prob, lvl))
            assert got == want


def test_solarize_add_lut(ref, img):
    from laudnet_tpu.data import auto_augment as ours

    for add in (0, 33, 77, 110):
        assert_pixel_equal(
            ours._solarize_add(img, add),
            ref.solarize_add(img, add),
            f"add {add}",
        )


def test_lighting_noise_matches_reference_formula():
    """PCA lighting: shift = eigvec @ (alpha * eigval), alpha ~ N(0, std)
    (reference `utils/transform.py:60-84`); zero std -> identity."""
    import random

    import numpy as np

    from laudnet_tpu.data.transforms import (
        LIGHTING_EIGVAL, LIGHTING_EIGVEC, lighting_noise, train_transform,
    )

    x = np.random.default_rng(0).random((8, 8, 3)).astype(np.float32)
    rng = random.Random(3)
    out = lighting_noise(x, rng, alphastd=0.1)
    rng2 = random.Random(3)
    alpha = np.array([rng2.gauss(0.0, 0.1) for _ in range(3)], np.float32)
    want = x + (LIGHTING_EIGVEC @ (alpha * LIGHTING_EIGVAL))[None, None]
    np.testing.assert_allclose(out, want, rtol=1e-6)
    # the shift is constant across pixels
    d = out - x
    assert np.allclose(d, d[0, 0][None, None], atol=1e-7)
    np.testing.assert_allclose(lighting_noise(x, rng, 0.0), x)

    # end-to-end through train_transform(change_light=True)
    from PIL import Image

    img = Image.fromarray((x * 255).astype(np.uint8)).resize((64, 64))
    t_on = train_transform(32, change_light=True)
    t_off = train_transform(32)
    a, b = t_on(img, 5), t_off(img, 5)
    assert a.shape == b.shape and not np.allclose(a, b)
