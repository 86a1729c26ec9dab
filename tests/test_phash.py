"""Perceptual image hashing (datapipe/multimodal.phash_*) and the
generalized Hamming pair generator."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from scalecast_spark.datapipe.multimodal import (
    _dct_mat,
    fake_decode,
    phash_images,
    phash_near_dup,
    phash_of_image,
)


def test_dct_matrix_is_orthonormal():
    D = _dct_mat(16)
    assert np.allclose(D @ D.T, np.eye(16), atol=1e-12)


def test_phash_invariances():
    # smooth "natural" image: low-frequency random content (an 8x8
    # seed upsampled 8x). A pure linear gradient would be degenerate —
    # most DCT coefficients exactly 0, so median-tie bits flip under
    # any perturbation.
    rng = np.random.RandomState(3)
    base = np.kron(rng.rand(8, 8) * 200, np.ones((8, 8)))
    img = base[..., None].repeat(3, -1)
    h1 = phash_of_image(img)
    # small noise: perceptually identical -> few differing bits
    noisy = img + rng.rand(64, 64, 3)
    h2 = phash_of_image(noisy)
    assert bin((h1 ^ h2) & ((1 << 64) - 1)).count("1") <= 4
    # a very different image -> far hash
    other = np.kron(rng.rand(8, 8) * 200, np.ones((8, 8)))[..., None].repeat(3, -1)
    h3 = phash_of_image(other)
    assert bin((h1 ^ h3) & ((1 << 64) - 1)).count("1") > 10
    # resize invariance: same content at 2x resolution
    big = np.kron(base, np.ones((2, 2)))[..., None].repeat(3, -1)
    assert phash_of_image(big) == h1
    assert -(1 << 63) <= h1 < (1 << 63)  # LongType-safe


def test_phash_images_and_near_dup(spark):
    # controlled decoder: payload byte 0 selects a base image; noise
    # scales with byte 1 -> ids 1/2 perceptual dups, 3 distinct
    def decode(raw: bytes) -> np.ndarray:
        rng = np.random.RandomState(raw[0])  # byte 0 picks the image
        base = np.kron(rng.rand(8, 8) * 200, np.ones((4, 4)))
        return (base + raw[1] * 0.1)[..., None].repeat(3, -1)

    rows = [
        (1, bytearray([0, 0])),
        (2, bytearray([0, 3])),
        (3, bytearray([1, 0])),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    hashes = phash_images(df, decode=decode)
    got = {r["doc_id"]: r["phash"] for r in hashes.collect()}
    assert got[4] is None  # null payload -> NULL hash, task survives
    assert got[1] is not None and got[3] is not None
    pairs = phash_near_dup(df, max_hamming=6, decode=decode).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in found
    assert not [p for p in found if 3 in p]


def test_hamming_near_pairs_pigeonhole_recall(spark):
    """Every pair within the radius must be found (band pigeonhole),
    compared against a brute-force reference."""
    from scalecast_spark.datapipe.dedup import hamming_near_pairs

    rng = np.random.RandomState(7)
    base = int(rng.randint(0, 1 << 62))
    vals = [base]
    for nbits in (1, 3, 6, 9):  # flips at increasing distance
        v = base
        for b in rng.choice(64, nbits, replace=False):
            v ^= 1 << int(b)
        vals.append(v - (1 << 64) if v >= 1 << 63 else v)
    df = spark.createDataFrame(
        [(i, int(v)) for i, v in enumerate(vals)], "doc_id long, h long"
    )
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_near_pairs(df, "h", "doc_id", 64, 6).collect()
    }
    # brute reference
    for i in range(len(vals)):
        for j in range(i + 1, len(vals)):
            d = bin((vals[i] ^ vals[j]) & ((1 << 64) - 1)).count("1")
            if d <= 6:
                assert got[(i, j)] == d, (i, j)
            else:
                assert (i, j) not in got
