"""Pure-Python/heapq oracle for seeded compact watershed with lines.

A slow, independent transcription of the published raveled priority-flood
algorithm used by ``skimage.segmentation.watershed`` (the call the reference
makes at ``hcat/segment.py:468-471``): Meyer flooding from markers ordered
by a binary heap on ``(value, age)``, the compact-watershed priority term
``image[q] + compactness·||q - source||`` (Neubert & Protzel 2014), and
watershed lines assigned at pop time when an already-labeled neighbor
carries a different label.

Deterministic choices (documented; mirrored by ``native/watershed.cpp`` so
the two can be compared bit-for-bit, including on plateaus):

* marker pixels are pushed in raveled (C-order) index order with strictly
  increasing ages — skimage gives all markers age 0 and leaves marker-
  plateau ties to heap internals; every non-marker push gets a unique age
  in both, so non-marker behavior is identical;
* neighbor offsets are scanned in the connectivity structure's C-order,
  stable-sorted by Euclidean distance (skimage's
  ``_offsets_to_raveled_neighbors`` order);
* first-wins labeling in every mode: a popped pixel that is already
  resolved (labeled or line, and is not its own source) is skipped;
* a pixel whose neighbor scan finds an already-labeled neighbor of a
  different region becomes a watershed line — neighbors earlier in scan
  order were already pushed, later ones are not (the ``break``);
* line pixels are *resolved*: they are marked with a sentinel during the
  flood (emitted as 0), are never re-claimed, never flooded through, and
  do not themselves count as a "different region" for the line test
  (otherwise lines would thicken);
* queue entries whose source marker was itself turned into a line are
  dropped.
"""

from __future__ import annotations

import heapq

import numpy as np


def _offsets(ndim: int, connectivity: int):
    """(offset multi-indices) in C-order, stable-sorted by distance."""
    offs = []
    for idx in np.ndindex(*(3,) * ndim):
        d = tuple(i - 1 for i in idx)
        m = sum(x * x for x in d)
        if m == 0 or m > connectivity:
            continue
        offs.append(d)
    offs.sort(key=lambda d: sum(x * x for x in d))  # stable
    return offs


def watershed_oracle(
    image: np.ndarray,
    markers: np.ndarray,
    mask: np.ndarray | None = None,
    connectivity: int = 1,
    compactness: float = 0.0,
    watershed_line: bool = False,
) -> np.ndarray:
    image = np.asarray(image, np.float64)
    output = np.asarray(markers).astype(np.int64).copy()
    if mask is None:
        mask = np.ones(image.shape, bool)
    else:
        mask = np.asarray(mask) != 0
    assert image.shape == output.shape == mask.shape

    # pad by one so raveled neighbor arithmetic never leaves the array
    pad = [(1, 1)] * image.ndim
    image_p = np.pad(image, pad)
    output_p = np.pad(output, pad)
    mask_p = np.pad(mask, pad)

    output_p[~mask_p] = 0
    shape = image_p.shape
    strides = np.array(
        [int(np.prod(shape[i + 1 :], dtype=np.int64)) for i in range(len(shape))]
    )
    img = image_p.ravel()
    out = output_p.ravel()
    msk = mask_p.ravel()

    offs_nd = _offsets(image.ndim, connectivity)
    offs = [int(np.dot(d, strides)) for d in offs_nd]

    def coords(i):
        c = []
        for s in strides:
            c.append(i // s)
            i = i % s
        return np.array(c, np.float64)

    heap = []
    age = 0
    for i in np.flatnonzero(out):
        heapq.heappush(heap, (img[i], age, int(i), int(i)))
        age += 1

    LINE = -1
    while heap:
        value, _, index, source = heapq.heappop(heap)
        if out[index] != 0 and index != source:
            continue  # already resolved (labeled or line)
        lab = out[source]
        if lab <= 0:
            continue  # source marker became a line: drop its flood
        out[index] = lab
        for off in offs:
            q = index + off
            if not msk[q]:
                continue
            if watershed_line and out[q] > 0 and out[q] != lab:
                out[index] = LINE
                break
            if out[q] != 0:
                continue
            age += 1
            val = img[q]
            if compactness > 0:
                val += compactness * float(
                    np.linalg.norm(coords(q) - coords(source))
                )
            heapq.heappush(heap, (val, age, int(q), source))

    out[out == LINE] = 0
    result = out.reshape(shape)
    inner = tuple(slice(1, -1) for _ in range(image.ndim))
    return result[inner].astype(np.int32)
