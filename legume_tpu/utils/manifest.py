"""Run manifests — the artifact contract between pipeline steps.

The reference chains binaries through `{prefix}.senna.json` manifests
(`senna/src/run_manifest.rs:269-952`); downstream commands inherit
inputs (and even cell->pb partitions) via `--from`. Same schema spirit
here: a JSON document recording inputs, outputs, artifact kinds, and
key hyperparameters.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field
from pathlib import Path
from typing import Any


@dataclass
class RunManifest:
    command: str
    inputs: dict[str, Any] = field(default_factory=dict)
    outputs: dict[str, str] = field(default_factory=dict)
    params: dict[str, Any] = field(default_factory=dict)
    engine: str = "legume-tpu"

    def save(self, prefix: str, suffix: str = "senna.json") -> str:
        path = f"{prefix}.{suffix}"
        Path(path).write_text(json.dumps(asdict(self), indent=2, default=str))
        return path

    @classmethod
    def load(cls, path: str) -> "RunManifest":
        doc = json.loads(Path(path).read_text())
        return cls(
            command=doc.get("command", ""),
            inputs=doc.get("inputs", {}),
            outputs=doc.get("outputs", {}),
            params=doc.get("params", {}),
            engine=doc.get("engine", ""),
        )
