"""Dispatch table for the senna subcommand handlers."""

from . import annotate_cmds
from . import embed_cmds
from . import layout_cmds
from . import masked_cmds
from . import topic_cmds

HANDLERS = {
    "vae": topic_cmds._cmd_vae,
    "joint-topic": topic_cmds._cmd_joint_topic,
    "predict": topic_cmds._cmd_predict,
    "eval-topic": topic_cmds._cmd_predict,
    "topic": topic_cmds._cmd_topic,
    "masked-topic": masked_cmds._cmd_masked,
    "masked-vae": masked_cmds._cmd_masked,
    "masked-sbp": masked_cmds._cmd_masked,
    "bge": embed_cmds._cmd_bge,
    "fne": embed_cmds._cmd_fne,
    "resolve-embedding-space": embed_cmds._cmd_rest,
    "rest": embed_cmds._cmd_rest,
    "svd": embed_cmds._cmd_svd,
    "joint-svd": embed_cmds._cmd_joint_svd,
    "clustering": embed_cmds._cmd_clustering,
    "layout": layout_cmds._cmd_layout,
    "pseudotime": layout_cmds._cmd_pseudotime,
    "plot-topic": layout_cmds._cmd_plot_topic,
    "plot": layout_cmds._cmd_plot,
    "plot-strand": layout_cmds._cmd_plot_strand,
    "annotate-by-projection": annotate_cmds._cmd_annotate_by_projection,
    "qmatrix": annotate_cmds._cmd_qmatrix,
    "annotate-ontology": annotate_cmds._cmd_annotate_ontology,
    "annotate-by-enrichment": annotate_cmds._cmd_annotate_by_enrichment,
    "deconvolve": annotate_cmds._cmd_deconvolve,
    "probe": annotate_cmds._cmd_probe,
    "impute": annotate_cmds._cmd_impute,
}

# layout --method tree takes a dedicated handler
LAYOUT_TREE = layout_cmds._cmd_layout_tree
