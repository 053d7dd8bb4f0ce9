from .manifest import IndexManifest, load_manifest, save_manifest

__all__ = ["IndexManifest", "load_manifest", "save_manifest"]
