"""`faba all` — chained feature extraction pipeline
(`faba/src/pipeline/` equivalent: snp -> genes -> editing -> apa ->
m6a, SURVEY.md section 2.5; each stage writes a standard backend and
one `{out}.gem.json`-style manifest records the chain).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field

from ..data.sparse_io import create_sparse_from_csc
from ..utils.manifest import RunManifest

log = logging.getLogger(__name__)


@dataclass
class FabaAllResult:
    outputs: dict = field(default_factory=dict)


def run_all(
    bam: str,
    gff: str,
    out: str,
    *,
    control_bam: str | None = None,
    min_mapq: int = 20,
) -> FabaAllResult:
    from .apa import run_apa
    from .dartseq import run_atoi, run_dartseq
    from .genes import count_genes
    from .snp import GenotypeParams, run_snp

    outputs = {}

    # SNP genotyping runs FIRST so its mask feeds the editing stages
    # (faba/src/pipeline/: run_snp_pipeline's returned mask gates the
    # m6a/atoi conversion calls)
    snp_dir = f"{out}.snp"
    sites = run_snp(
        [bam], snp_dir, gff=gff, bulk=True,
        params=GenotypeParams(min_coverage=8, min_alt_count=2),
        min_mapping_quality=min_mapq, min_base_quality=0,
    )
    snp_mask = None
    if len(sites):
        outputs["snp"] = f"{snp_dir}/snp_sites.parquet"
        from .snp import build_snp_mask

        snp_mask = set(build_snp_mask(sites, 20.0, None)) or None

    counts, genes, barcodes = count_genes(bam, gff, min_mapq=min_mapq)
    create_sparse_from_csc(counts, f"{out}.genes.zarr", genes, barcodes)
    outputs["genes"] = f"{out}.genes.zarr"

    apa = run_apa(bam, gff, min_mapq=min_mapq)
    if apa.counts.shape[0]:
        create_sparse_from_csc(
            apa.counts, f"{out}.apa.zarr", apa.site_names, apa.barcodes
        )
        outputs["apa"] = f"{out}.apa.zarr"

    if control_bam:
        from .bam import read_bam_ref_names
        from .genes import parse_gff_exons, parse_gff_genes
        from .mixture import run_mixture

        model = parse_gff_genes(gff)
        exons = parse_gff_exons(gff, model)
        # contig names read once from the header (a full read_bam here
        # would re-parse all records + mismatches once per modality)
        bam_ref_names = read_bam_ref_names(bam)
        for name, runner in (("m6a", run_dartseq), ("atoi", run_atoi)):
            res = runner(bam, control_bam, snp_mask=snp_mask)
            if res.cell_counts.shape[0]:
                create_sparse_from_csc(
                    res.cell_counts, f"{out}.{name}.zarr", res.site_names, res.barcodes
                )
                outputs[name] = f"{out}.{name}.zarr"
                # per-gene site mixture rides the pipeline's gene model
                # (mixture_pipeline.rs runs by default inside run_m6a);
                # converted weights: the per-cell coverage pass is the
                # standalone command's opt-in posterior refinement
                modality = "m6a" if runner is run_dartseq else "atoi"
                mat, names_mix, components, _bw = run_mixture(
                    res.cell_counts, res.sites[:, 0], res.sites[:, 1],
                    res.strand, bam_ref_names, model, exons,
                    modality=modality, weight_mode="converted",
                )
                if mat is not None:
                    create_sparse_from_csc(
                        mat, f"{out}.{name}_mixture.zarr", names_mix, res.barcodes
                    )
                    components.to_parquet(f"{out}.{name}_components.parquet")
                    outputs[f"{name}_mixture"] = f"{out}.{name}_mixture.zarr"

    RunManifest(
        command="faba-all",
        inputs={"bam": bam, "gff": gff, "control_bam": control_bam},
        outputs=outputs,
    ).save(out, "gem.json")
    log.info("faba all: wrote %s", sorted(outputs))
    return FabaAllResult(outputs=outputs)
