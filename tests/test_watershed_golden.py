"""Ground-truth anchoring of the watershed semantics (VERDICT r2, item 6).

skimage is absent in this environment, so round 2 proved parity between two
builder-written implementations (C++ and python) of the documented
algorithm — leaving open the possibility that both encode the same
misreading.  These tests anchor the semantics to *implementation-independent
mathematics* instead: scenes where the output of ANY correct seeded
watershed (the published Meyer priority-flood definition the reference
calls at ``hcat/segment.py:468-471``, the compact-watershed definition of
Neubert & Protzel 2014) is provably unique, so no shared misreading can
pass:

1. strict basins: every pixel whose pass height to one seed is strictly
   below its pass height to every other seed must get that seed's label —
   asserted both on a literal hand-built scene and against a brute-force
   sublevel-set connectivity computation on random distinct-height scenes
   (the topographic "minimax" definition, computed without any flood);
2. the compact-watershed Voronoi limit: on a constant image the priority
   reduces to ``compactness * ||q - seed||``, so the result must be the
   nearest-seed partition wherever that is strict (seeds chosen so the
   equidistant set is empty by a parity argument);
3. watershed lines must separate regions: no two axis-adjacent pixels may
   carry different positive labels.

Each case runs against BOTH the production C++ flood
(``native/watershed.cpp`` via ``ops.watershed``) and the pure-python oracle
(``tests/watershed_oracle.py``), plus the fused ``instance_tile`` op at the
reference's production 1212² tile geometry (``hcat/segment.py:237-242``).
"""

import numpy as np
import pytest

from hcunet_tpu.ops.watershed import instance_tile, watershed
from tests.watershed_oracle import watershed_oracle

IMPLS = [("native", watershed), ("oracle", watershed_oracle)]


# ---------------------------------------------------------------------------
# 1a. literal strict-basin scene
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name,impl", IMPLS)
def test_strict_basins_literal(name, impl):
    """Two V-shaped basins split by a strictly higher ridge: labels on the
    slopes are forced by topography (pass heights 5 vs 9, strict); with
    watershed_line=True the ridge column must become line (every ridge pixel
    pops after both slopes are fully labeled, so the differing-neighbor rule
    fires regardless of which flood pushed it)."""
    col_heights = np.array([1, 2, 3, 4, 5, 9, 5, 4, 3, 2, 1], np.float64)
    image = np.tile(col_heights, (5, 1))  # [5, 11]
    markers = np.zeros_like(image, np.int32)
    markers[2, 0] = 1
    markers[2, 10] = 2

    got = impl(image, markers, connectivity=1, watershed_line=True)
    expected = np.tile(
        np.array([1] * 5 + [0] + [2] * 5, np.int32), (5, 1)
    )
    np.testing.assert_array_equal(got, expected, err_msg=name)

    # without lines the slopes are still forced; the ridge's owner is a
    # documented tie-break, so only the strict part is asserted
    got = impl(image, markers, connectivity=1, watershed_line=False)
    np.testing.assert_array_equal(got[:, :5], expected[:, :5], err_msg=name)
    np.testing.assert_array_equal(got[:, 6:], expected[:, 6:], err_msg=name)
    assert np.all(got[:, 5] > 0), name  # no-line mode labels everything


# ---------------------------------------------------------------------------
# 1b. minimax definition on random distinct-height scenes
# ---------------------------------------------------------------------------


def _pass_heights(image, seed_xy, connectivity=1):
    """Brute-force topographic pass height from one seed to every pixel:
    min threshold t such that the pixel and the seed are 4-connected inside
    the sublevel set {image <= t}.  No flood, no heap — union-find over
    pixels in ascending height order."""
    from scipy import ndimage as ndi

    out = np.full(image.shape, np.inf)
    for t in np.unique(image):
        sub = image <= t
        lab, _ = ndi.label(
            sub, structure=ndi.generate_binary_structure(2, connectivity)
        )
        if not sub[seed_xy]:
            continue
        reach = (lab == lab[seed_xy]) & np.isinf(out)
        out[reach] = t
    return out


@pytest.mark.parametrize("name,impl", IMPLS)
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_minimax_assignment_matches_definition(name, impl, seed):
    """Wherever one seed's pass height is strictly lower, ANY correct Meyer
    flood must assign that seed's label — asserted against the sublevel-set
    computation, which shares no code (or algorithm) with either flood."""
    rng = np.random.default_rng(seed)
    image = rng.permutation(20 * 20).reshape(20, 20).astype(np.float64)
    s1, s2 = (3, 4), (16, 15)
    image[s1] = -1.0  # seeds at basin bottoms (distinct values preserved)
    image[s2] = -2.0
    markers = np.zeros_like(image, np.int32)
    markers[s1] = 1
    markers[s2] = 2

    p1 = np.maximum(_pass_heights(image, s1), image[s1])
    p2 = np.maximum(_pass_heights(image, s2), image[s2])
    got = impl(image, markers, connectivity=1, watershed_line=False)

    strict1 = p1 < p2
    strict2 = p2 < p1
    # beyond the global pass every pixel ties, so the strict sets are
    # asymmetric; require both to be non-trivially exercised
    assert strict1.sum() > 10 and strict2.sum() > 10
    np.testing.assert_array_equal(
        got[strict1], np.ones(strict1.sum(), np.int32), err_msg=name
    )
    np.testing.assert_array_equal(
        got[strict2], np.full(strict2.sum(), 2, np.int32), err_msg=name
    )


# ---------------------------------------------------------------------------
# 2. compact-watershed Voronoi limit
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name,impl", IMPLS)
def test_compact_voronoi_limit(name, impl):
    """On a constant image the compact-watershed priority is purely
    ``compactness * ||q - seed||`` (Neubert & Protzel 2014), so the result
    must be the nearest-seed Voronoi partition.  Seeds (0,0) and (5,2):
    d1² - d2² = 10x + 4y - 29 is odd-even and never zero on the integer
    grid, so the partition is strict everywhere."""
    image = np.zeros((8, 8), np.float64)
    s1, s2 = (0, 0), (5, 2)
    markers = np.zeros_like(image, np.int32)
    markers[s1] = 1
    markers[s2] = 2

    xx, yy = np.indices(image.shape)
    d1 = (xx - s1[0]) ** 2 + (yy - s1[1]) ** 2
    d2 = (xx - s2[0]) ** 2 + (yy - s2[1]) ** 2
    assert not np.any(d1 == d2)
    expected = np.where(d1 < d2, 1, 2).astype(np.int32)

    got = impl(
        image, markers, connectivity=1, compactness=1.0, watershed_line=False
    )
    np.testing.assert_array_equal(got, expected, err_msg=name)


# ---------------------------------------------------------------------------
# 3. watershed lines must separate regions
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name,impl", IMPLS)
@pytest.mark.parametrize("seed", [0, 1])
def test_lines_separate_regions(name, impl, seed):
    rng = np.random.default_rng(seed)
    image = rng.permutation(24 * 24).reshape(24, 24).astype(np.float64)
    markers = np.zeros_like(image, np.int32)
    for i, (x, y) in enumerate([(2, 2), (20, 4), (5, 19), (18, 18)]):
        markers[x, y] = i + 1

    got = impl(image, markers, connectivity=1, watershed_line=True)
    for ax in (0, 1):
        a = np.moveaxis(got, ax, 0)[:-1]
        b = np.moveaxis(got, ax, 0)[1:]
        touching = (a > 0) & (b > 0) & (a != b)
        assert not touching.any(), (name, ax)


# ---------------------------------------------------------------------------
# 4. fused instance tile at the reference's production 1212² geometry
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_instance_tile_production_1212():
    """Fuzz the fused native op at the reference's ≥16 GB-RAM watershed tile
    size (``hcat/segment.py:237-242``: [1212, 1212]) against the
    materialized z-replicate/dilate/flood path — the round-2 parity tests
    topped out at 768²."""
    from scipy import ndimage as ndi

    rng = np.random.default_rng(11)
    X, Y, Z = 1212, 1212, 4
    prob = np.zeros((X, Y, Z), np.float32)
    zz = (np.arange(Z) - Z / 2.0) ** 2 / 6.0
    n_cells = 220
    centers = []
    for _ in range(n_cells):
        x0 = int(rng.uniform(20, X - 20))
        y0 = int(rng.uniform(20, Y - 20))
        centers.append((x0, y0))
        gx = (np.arange(x0 - 16, x0 + 16) - x0).astype(np.float32) ** 2
        gy = (np.arange(y0 - 16, y0 + 16) - y0).astype(np.float32) ** 2
        g = np.exp(
            -(gx[:, None, None] + gy[None, :, None]) / 70.0 - zz[None, None, :]
        )
        xs, ys = slice(x0 - 16, x0 + 16), slice(y0 - 16, y0 + 16)
        prob[xs, ys] = np.maximum(prob[xs, ys], g)

    tile = prob.astype(np.float64) + 1e-8
    tile -= tile.min()
    tile /= tile.max()
    binary = tile > 0.5
    seeds = np.zeros(tile.shape, np.int32)
    for i, (x0, y0) in enumerate(centers):
        seeds[x0 : x0 + 2, y0 : y0 + 2, 1:3] = i + 2

    kw = dict(connectivity=1, compactness=0.01, watershed_line=True)
    ez, em, floor, bg = 5, 3, 0.2, 0.15
    got = instance_tile(
        tile, binary, seeds, expand_z=ez, expand_mask=em,
        distance_floor=floor, seed_background_below=bg, **kw,
    )

    dist_e = np.repeat(tile, ez, axis=2)
    seed_e = np.repeat(seeds, ez, axis=2)
    mask_e = np.repeat(binary, ez, axis=2)
    dist_e[dist_e < floor] = 0
    mask_e = ndi.binary_dilation(mask_e, iterations=em)
    seed_e[dist_e < bg] = 1
    want = watershed(-dist_e, seed_e, mask=mask_e, **kw)[:, :, ::ez]
    np.testing.assert_array_equal(got, want)
    assert len(np.unique(got)) > n_cells * 0.8  # most cells got a basin
