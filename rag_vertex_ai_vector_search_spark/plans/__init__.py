from .manifest import IndexManifest, load_manifest, save_manifest
from .run_log import setup_run_logging

__all__ = ["IndexManifest", "load_manifest", "save_manifest", "setup_run_logging"]
