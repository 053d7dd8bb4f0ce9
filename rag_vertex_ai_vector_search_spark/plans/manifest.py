"""Index manifest: the engine's analog of the reference's INDEX_CONFIG
+ deployment state.

The reference keeps index parameters in common/config.py:30-41
(dimensions, distance measure, approximate_neighbors_count, tree-AH
leaf params) and derives deployment state by probing the endpoint
(index_manager.py:140-166: DEPLOYED / DEPLOYING / NOT_FOUND). Here an
index is a parquet layout plus this JSON manifest next to it; "deploy"
is registering the table, and the state probe is a manifest+path check
(SURVEY.md O11-O13).
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field


@dataclass
class IndexManifest:
    dimensions: int
    distance_measure: str = "DOT_PRODUCT_DISTANCE"  # common/config.py:33
    approximate_neighbors_count: int = 150          # common/config.py:32
    n_clusters: int = 16                            # tree-AH leaf analog
    probe_percent: float = 10.0                     # leaf_nodes_to_search_percent
    leaf_node_embedding_count: int = 500            # common/config.py:37
    update_method: str = "STREAM_UPDATE"            # index_manager.py:53
    extra: dict = field(default_factory=dict)

    @property
    def filename(self) -> str:
        return "_index_manifest.json"


def save_manifest(manifest: IndexManifest, index_path: str) -> str:
    os.makedirs(index_path, exist_ok=True)
    out = os.path.join(index_path, manifest.filename)
    with open(out, "w") as f:
        json.dump(asdict(manifest), f, indent=2, sort_keys=True)
    return out


def load_manifest(index_path: str) -> IndexManifest:
    with open(os.path.join(index_path, "_index_manifest.json")) as f:
        return IndexManifest(**json.load(f))


def deployment_state(index_path: str) -> str:
    """DEPLOYED / NOT_FOUND, mirroring get_deployment_state
    (index_manager.py:140-166); no DEPLOYING state -- Spark writes are
    synchronous (SURVEY.md O12)."""
    return (
        "DEPLOYED"
        if os.path.exists(os.path.join(index_path, "_index_manifest.json"))
        else "NOT_FOUND"
    )
