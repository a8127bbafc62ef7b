"""`faba snp` — pileup genotyper (`faba/src/snp/genotyper.rs`
equivalent).

Per site with any mismatch evidence: alt depth from the MD-tag
mismatch stream (deduped), total depth from read coverage; genotype by
binomial VAF thresholds with Phred-style quality = -10 log10 of the
runner-up genotype likelihood ratio.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass

import numpy as np
from scipy.stats import binom

from .bam import read_bam
from .dartseq import _dedup, coverage_at_sites

log = logging.getLogger(__name__)

GENOTYPES = ("0/0", "0/1", "1/1")
_VAF = (0.01, 0.5, 0.99)


@dataclass
class SnpCalls:
    ref_id: np.ndarray
    pos: np.ndarray
    ref_base: list
    alt_base: list
    depth: np.ndarray
    alt_depth: np.ndarray
    genotype: list
    qual: np.ndarray
    ref_names: list


def genotype_likelihoods(alt: np.ndarray, depth: np.ndarray) -> np.ndarray:
    """[S, 3] log-likelihoods under VAF = (err, 0.5, 1-err)."""
    out = np.stack(
        [binom.logpmf(alt, depth, v) for v in _VAF], axis=1
    )
    return out


def call_snps(
    bam_path: str,
    *,
    min_depth: int = 8,
    min_alt: int = 2,
    min_qual: float = 20.0,
) -> SnpCalls:
    recs = read_bam(bam_path)
    rid = recs.mm_ref_id
    pos = recs.mm_pos
    rb = recs.mm_ref_base
    ab = recs.mm_read_base
    cb = recs.mm_cb_id
    umi = recs.mm_umi_id
    if len(rid):
        first = _dedup([rid, pos, cb, umi, ab.astype(np.int64)])
        rid, pos, rb, ab = rid[first], pos[first], rb[first], ab[first]

    # per (site, alt allele) counts; keep the dominant alt per site
    keys, inv = np.unique(np.stack([rid, pos, ab.astype(np.int32)]), axis=1, return_inverse=True)
    counts = np.bincount(inv, minlength=keys.shape[1])
    site_keys, site_inv = np.unique(keys[:2], axis=1, return_inverse=True)
    n_sites = site_keys.shape[1]
    best_alt = np.zeros(n_sites, np.int32)
    alt_depth = np.zeros(n_sites, np.float64)
    ref_base = np.zeros(n_sites, np.uint8)
    for k in range(keys.shape[1]):
        s = site_inv[k]
        if counts[k] > alt_depth[s]:
            alt_depth[s] = counts[k]
            best_alt[s] = keys[2, k]
    # ref base per site from any mismatch record
    lut = {(int(site_keys[0, s]), int(site_keys[1, s])): s for s in range(n_sites)}
    for i in range(len(rid)):
        ref_base[lut[(int(rid[i]), int(pos[i]))]] = rb[i]

    depth = coverage_at_sites(recs, site_keys[0], site_keys[1])
    ll = genotype_likelihoods(alt_depth, np.maximum(depth, alt_depth))
    order = np.argsort(-ll, axis=1)
    qual = 10.0 / np.log(10.0) * (
        np.take_along_axis(ll, order[:, :1], 1)[:, 0]
        - np.take_along_axis(ll, order[:, 1:2], 1)[:, 0]
    )
    gt = [GENOTYPES[o] for o in order[:, 0]]

    keep = (depth >= min_depth) & (alt_depth >= min_alt) & (qual >= min_qual) & (
        np.asarray([g != "0/0" for g in gt])
    )
    return SnpCalls(
        ref_id=site_keys[0][keep],
        pos=site_keys[1][keep],
        ref_base=[chr(b) for b in ref_base[keep]],
        alt_base=[chr(b) for b in best_alt[keep]],
        depth=depth[keep],
        alt_depth=alt_depth[keep],
        genotype=[g for g, k in zip(gt, keep) if k],
        qual=qual[keep],
        ref_names=recs.ref_names,
    )
