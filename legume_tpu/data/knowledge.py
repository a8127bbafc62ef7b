"""Knowledge bases: OBO ontology DAG + GMT/GAF gene sets
(auxiliary-data `ontology.rs` / `gene_sets.rs` equivalents).

The OBO parser builds an `is_a`/`part_of` parent DAG with ancestor
closure (petgraph role); GMT/GAF readers apply true-path propagation
(a gene annotated to a term belongs to every ancestor term).
"""

from __future__ import annotations

import gzip
from dataclasses import dataclass, field


@dataclass
class Ontology:
    terms: dict  # id -> name
    parents: dict  # id -> set of parent ids (is_a + part_of)
    obsolete: set = field(default_factory=set)

    def ancestors(self, term: str) -> set:
        """Transitive closure up the DAG (ontology.rs is_a/part_of)."""
        out, stack = set(), [term]
        while stack:
            t = stack.pop()
            for p in self.parents.get(t, ()):  # noqa: E501
                if p not in out:
                    out.add(p)
                    stack.append(p)
        return out

    def roots(self) -> set:
        return {t for t in self.terms if not self.parents.get(t)}


def parse_obo(path: str) -> Ontology:
    opener = gzip.open if str(path).endswith(".gz") else open
    terms, parents, obsolete = {}, {}, set()
    cur = None
    with opener(path, "rt") as f:
        for line in f:
            line = line.strip()
            if line == "[Term]":
                cur = None
            elif line.startswith("id: "):
                cur = line[4:]
                parents.setdefault(cur, set())
            elif cur and line.startswith("name: "):
                terms[cur] = line[6:]
            elif cur and line.startswith("is_a: "):
                parents[cur].add(line[6:].split(" ")[0])
            elif cur and line.startswith("relationship: part_of "):
                parents[cur].add(line.split(" ")[2])
            elif cur and line.startswith("is_obsolete: true"):
                obsolete.add(cur)
    return Ontology(terms=terms, parents=parents, obsolete=obsolete)


def read_gmt(path: str) -> dict[str, list[str]]:
    """GMT gene sets: name <tab> desc <tab> genes... (gene_sets.rs)."""
    opener = gzip.open if str(path).endswith(".gz") else open
    out = {}
    with opener(path, "rt") as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) >= 3:
                out[parts[0]] = [g for g in parts[2:] if g]
    return out


def read_gaf(path: str, ontology: Ontology | None = None) -> dict[str, set]:
    """GAF annotations term -> genes with true-path propagation up the
    ontology when provided (gene_sets.rs:1-20)."""
    opener = gzip.open if str(path).endswith(".gz") else open
    term_genes: dict[str, set] = {}
    with opener(path, "rt") as f:
        for line in f:
            if line.startswith("!"):
                continue
            parts = line.rstrip("\n").split("\t")
            if len(parts) < 5:
                continue
            gene, term = parts[2], parts[4]
            term_genes.setdefault(term, set()).add(gene)
    if ontology is not None:
        propagated: dict[str, set] = {t: set(g) for t, g in term_genes.items()}
        for t, genes in term_genes.items():
            for anc in ontology.ancestors(t):
                propagated.setdefault(anc, set()).update(genes)
        return propagated
    return term_genes
