"""AutoAugment (ImageNet policy) — compact PIL implementation.

The reference vendors timm's full AutoAugment engine
(`utils/auto_augment.py`, 659 LoC). This is a clean-room implementation of
the published ImageNet AutoAugment policy (Cubuk et al., 2019): 25
sub-policies of two (op, probability, magnitude) steps; one sub-policy is
sampled per image. Magnitudes follow the paper's 10-level ranges.
"""

from __future__ import annotations

import random

from PIL import Image, ImageEnhance, ImageOps

_FILL = (128, 128, 128)


def _shear_x(img, v):
    return img.transform(img.size, Image.AFFINE, (1, v, 0, 0, 1, 0),
                         fillcolor=_FILL)


def _shear_y(img, v):
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, v, 1, 0),
                         fillcolor=_FILL)


def _translate_x(img, v):
    return img.transform(img.size, Image.AFFINE,
                         (1, 0, v * img.size[0], 0, 1, 0), fillcolor=_FILL)


def _translate_y(img, v):
    return img.transform(img.size, Image.AFFINE,
                         (1, 0, 0, 0, 1, v * img.size[1]), fillcolor=_FILL)


def _rotate(img, v):
    return img.rotate(v, fillcolor=_FILL)


def _enhance(enhancer):
    return lambda img, v: enhancer(img).enhance(1.0 + v)


OPS = {
    "ShearX": (_shear_x, 0.3),
    "ShearY": (_shear_y, 0.3),
    "TranslateX": (_translate_x, 0.45),
    "TranslateY": (_translate_y, 0.45),
    "Rotate": (_rotate, 30.0),
    "Color": (_enhance(ImageEnhance.Color), 0.9),
    "Contrast": (_enhance(ImageEnhance.Contrast), 0.9),
    "Brightness": (_enhance(ImageEnhance.Brightness), 0.9),
    "Sharpness": (_enhance(ImageEnhance.Sharpness), 0.9),
    "Posterize": (lambda img, v: ImageOps.posterize(img, max(1, int(v))), None),
    "Solarize": (lambda img, v: ImageOps.solarize(img, int(v)), None),
    "AutoContrast": (lambda img, v: ImageOps.autocontrast(img), None),
    "Equalize": (lambda img, v: ImageOps.equalize(img), None),
    "Invert": (lambda img, v: ImageOps.invert(img), None),
}

# The published ImageNet policy: (op, prob, magnitude-level 0..9) pairs.
IMAGENET_POLICY = [
    (("Posterize", 0.4, 8), ("Rotate", 0.6, 9)),
    (("Solarize", 0.6, 5), ("AutoContrast", 0.6, 5)),
    (("Equalize", 0.8, 8), ("Equalize", 0.6, 3)),
    (("Posterize", 0.6, 7), ("Posterize", 0.6, 6)),
    (("Equalize", 0.4, 7), ("Solarize", 0.2, 4)),
    (("Equalize", 0.4, 4), ("Rotate", 0.8, 8)),
    (("Solarize", 0.6, 3), ("Equalize", 0.6, 7)),
    (("Posterize", 0.8, 5), ("Equalize", 1.0, 2)),
    (("Rotate", 0.2, 3), ("Solarize", 0.6, 8)),
    (("Equalize", 0.6, 8), ("Posterize", 0.4, 6)),
    (("Rotate", 0.8, 8), ("Color", 0.4, 0)),
    (("Rotate", 0.4, 9), ("Equalize", 0.6, 2)),
    (("Equalize", 0.0, 7), ("Equalize", 0.8, 8)),
    (("Invert", 0.6, 4), ("Equalize", 1.0, 8)),
    (("Color", 0.6, 4), ("Contrast", 1.0, 8)),
    (("Rotate", 0.8, 8), ("Color", 1.0, 2)),
    (("Color", 0.8, 8), ("Solarize", 0.8, 7)),
    (("Sharpness", 0.4, 7), ("Invert", 0.6, 8)),
    (("ShearX", 0.6, 5), ("Equalize", 1.0, 9)),
    (("Color", 0.4, 0), ("Equalize", 0.6, 3)),
    (("Equalize", 0.4, 7), ("Solarize", 0.2, 4)),
    (("Solarize", 0.6, 5), ("AutoContrast", 0.6, 5)),
    (("Invert", 0.6, 4), ("Equalize", 1.0, 8)),
    (("Color", 0.6, 4), ("Contrast", 1.0, 8)),
    (("Equalize", 0.8, 8), ("Equalize", 0.6, 3)),
]


def _magnitude(op: str, level: int, rng: random.Random) -> float:
    fn, max_v = OPS[op]
    if op == "Posterize":
        return 8 - int(level / 9 * 4)  # 8 -> 4 bits
    if op == "Solarize":
        return 256 - int(level / 9 * 256)
    if max_v is None:
        return 0.0
    v = level / 9 * max_v
    return -v if rng.random() < 0.5 else v


def auto_augment_transform(config: str = "original"):
    """Returns fn(PIL, rng) -> PIL applying one sampled sub-policy."""

    def fn(img: Image.Image, rng: random.Random) -> Image.Image:
        policy = IMAGENET_POLICY[rng.randrange(len(IMAGENET_POLICY))]
        for op, prob, level in policy:
            if rng.random() <= prob:
                img = OPS[op][0](img, _magnitude(op, level, rng))
        return img

    return fn
