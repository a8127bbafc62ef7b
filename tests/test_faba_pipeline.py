"""faba all: unified pipeline surface
(`faba/src/pipeline/{args,run,steps}.rs` parity — stage order, skips,
multi-sample quantification, depth tiles, knob threading)."""

import numpy as np
import pandas as pd
import pytest

from legume_tpu.cli import main as cli
from legume_tpu.data.sparse_io import open_sparse_matrix
from legume_tpu.faba.bam import write_bam
from legume_tpu.faba.pipeline import run_all


def _reads(prefix, pos, n_conv, n_ref, cells, read_len=40, off=10):
    reads = []
    for i in range(n_conv + n_ref):
        conv = i < n_conv
        md = f"{off}C{read_len - off - 1}" if conv else f"{read_len}"
        seq = list("A" * read_len)
        seq[off] = "T" if conv else "C"
        reads.append(dict(
            name=f"{prefix}{i}", ref_id=0, pos=pos, seq="".join(seq),
            cigar=f"{read_len}M", cb=cells[i % len(cells)],
            ub=f"u{prefix}{i}", md=md,
        ))
    return reads


@pytest.fixture(scope="module")
def pipeline_fixture(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pipe")
    cells = ["cellA", "cellB", "cellC"]
    wt = (_reads("s1_", 100, 12, 8, cells)
          + _reads("s2_", 500, 1, 25, cells))
    ct = (_reads("c1_", 100, 1, 20, cells)
          + _reads("c2_", 500, 1, 24, cells))
    wt2 = _reads("w2_", 100, 10, 10, cells)
    paths = {}
    for name, reads in (("wt", wt), ("ct", ct), ("wt2", wt2)):
        paths[name] = str(tmp / f"{name}.bam")
        write_bam(paths[name], [("chr1", 10000)], reads)
    gff = tmp / "g.gff"
    gff.write_text("chr1\tx\tgene\t50\t900\t.\t+\t.\tgene_name=G1\n")
    return paths, str(gff), tmp


def test_pipeline_skips_and_depth(pipeline_fixture, tmp_path):
    paths, gff, _ = pipeline_fixture
    out = str(tmp_path / "run")
    res = run_all(
        paths["wt"], gff, out, control_bam=paths["ct"],
        skip_apa=True, skip_snp=True, skip_atoi=True,
        depth_resolution_kb=1.0,
    )
    assert "snp" not in res.outputs and "apa" not in res.outputs
    assert "atoi" not in res.outputs
    assert "m6a" in res.outputs and "genes" in res.outputs
    # the control arm is quantified too, batch-suffixed
    assert "genes.ct" in res.outputs and "depth.ct" in res.outputs
    be = open_sparse_matrix(res.outputs["depth"])
    # 10 kb contig at 1 kb tiles -> 10 rows; reads at 100/500 hit tile 0
    assert be.num_rows == 10
    names = be.row_names()
    assert names[0] == "chr1:0-1000"
    dense = be.read_columns_dense(np.arange(be.num_columns))
    assert dense[0].sum() > 0 and dense[5:].sum() == 0


def test_pipeline_multi_sample_quantifies_controls(
    pipeline_fixture, tmp_path,
):
    paths, gff, _ = pipeline_fixture
    out = str(tmp_path / "multi")
    res = run_all(
        [paths["wt"], paths["wt2"]], gff, out,
        control_bam=paths["ct"], skip_apa=True, skip_snp=True,
        skip_atoi=True,
    )
    # every sample (both WT batches AND the control) gets a gene
    # matrix, per-batch tagged (run.rs all_quant_bam_files)
    assert {"genes.wt", "genes.wt2", "genes.ct"} <= set(res.outputs)
    # the editing contrast runs per WT batch against the control
    assert {"m6a.wt", "m6a.wt2"} <= set(res.outputs)
    be = open_sparse_matrix(res.outputs["genes.ct"])
    assert be.num_rows == 1  # the one gene


def test_pipeline_cli_full_surface(pipeline_fixture, tmp_path):
    paths, gff, _ = pipeline_fixture
    out = str(tmp_path / "cli")
    cli.run_faba([
        "all", "--bam", paths["wt"], "--gff", gff,
        "--output", out, "--control-bam", paths["ct"],
        "--zip", "--snp-min-coverage", "8", "--snp-min-alt-count", "2",
        "--snp-mask-min-vaf", "0.2", "--min-base-quality", "0",
        "--atoi-pvalue-cutoff", "0.05", "--no-apa-pdui",
        "--apa-min-coverage", "4", "--depth-resolution-kb", "2",
    ])
    # zip outputs + snp directory
    assert (tmp_path / "cli.genes.zarr.zip").exists()
    assert (tmp_path / "cli.apa.zarr.zip").exists()
    snps = pd.read_parquet(f"{out}.snp/snp_sites.parquet")
    assert len(snps) >= 1
    # the conversion site at chr1:110 reads as a het variant in the
    # merged pileup (VAF ~0.32, inside the [0.2, 0.8] germline band):
    # it enters the mask and the would-be m6A site — the ONLY
    # candidate — is suppressed, so no m6a matrix is written at all
    mask = pd.read_parquet(f"{out}.snp/snp_mask.parquet")
    assert ("chr1", 110) in set(zip(mask["chrom"], mask["pos"]))
    assert not (tmp_path / "cli.m6a.zarr.zip").exists()
    # without the germline gate the site stays callable
    out2 = str(tmp_path / "cli2")
    cli.run_faba([
        "all", "--bam", paths["wt"], "--gff", gff, "--output", out2,
        "--control-bam", paths["ct"], "--skip-snp", "--skip-apa",
        "--skip-atoi", "--min-base-quality", "0",
    ])
    be = open_sparse_matrix(f"{out2}.m6a.zarr")
    assert any(n.split("/")[0].endswith(":110") for n in be.row_names())


def test_pipeline_gene_qc_gate(pipeline_fixture, tmp_path):
    paths, gff, _ = pipeline_fixture
    out = str(tmp_path / "qc")
    res = run_all(
        paths["wt"], gff, out, skip_snp=True, skip_apa=True,
        gene_qc=True, gene_min_cells=99, gene_min_counts=0,
        cell_min_genes=0,
    )
    be = open_sparse_matrix(res.outputs["genes"])
    assert be.num_rows == 0  # the 99-cell floor drops the one gene
