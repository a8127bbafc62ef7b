"""`faba depth` — per-cell coverage features and BED utilities
(`faba depth` + `genomic-data/src/bed.rs` equivalents)."""

from __future__ import annotations

import gzip
import logging
from dataclasses import dataclass

import numpy as np
import scipy.sparse as sp

from .bam import read_bam

log = logging.getLogger(__name__)


@dataclass
class BedIntervals:
    chrom: list
    start: np.ndarray
    end: np.ndarray
    name: list


def read_bed(path: str) -> BedIntervals:
    """BED3/BED4+ reader (bed.rs)."""
    opener = gzip.open if str(path).endswith(".gz") else open
    chrom, start, end, name = [], [], [], []
    with opener(path, "rt") as f:
        for line in f:
            if line.startswith(("#", "track", "browser")):
                continue
            p = line.split()
            if len(p) < 3:
                continue
            chrom.append(p[0])
            start.append(int(p[1]))
            end.append(int(p[2]))
            name.append(p[3] if len(p) > 3 else f"{p[0]}:{p[1]}-{p[2]}")
    return BedIntervals(
        chrom=chrom,
        start=np.asarray(start, np.int64),
        end=np.asarray(end, np.int64),
        name=name,
    )


def depth_per_region(
    bam_path: str,
    bed: BedIntervals,
    *,
    min_mapq: int = 20,
) -> tuple[sp.csc_matrix, list, list]:
    """(coverage [n_regions, n_cells], region names, barcodes):
    deduped read counts overlapping each region."""
    recs = read_bam(bam_path)
    keep = (recs.mapq >= min_mapq) & (recs.cb_id >= 0) & ((recs.flag & 0x904) == 0)
    rid = recs.ref_id[keep]
    pos = recs.pos[keep]
    end = recs.end_pos[keep]
    cb = recs.cb_id[keep]
    umi = recs.umi_id[keep]
    # (cell, umi, position) dedup
    tbl = np.stack([rid, pos, cb, umi])
    _, first = np.unique(tbl, axis=1, return_index=True)
    rid, pos, end, cb = rid[first], pos[first], end[first], cb[first]

    ref_idx = {n: i for i, n in enumerate(recs.ref_names)}
    rows, cols = [], []
    for r, (c, s, e) in enumerate(zip(bed.chrom, bed.start, bed.end)):
        ci = ref_idx.get(c)
        if ci is None:
            continue
        hit = (rid == ci) & (pos < e) & (end > s)
        rows.extend([r] * int(hit.sum()))
        cols.extend(cb[hit].tolist())
    counts = sp.coo_matrix(
        (np.ones(len(rows), np.float32), (rows, cols)),
        shape=(len(bed.name), len(recs.barcodes)),
    ).tocsc()
    return counts, list(bed.name), recs.barcodes
