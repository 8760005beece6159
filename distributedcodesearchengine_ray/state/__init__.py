from .manifest import IndexManifest, PartitionRecord

__all__ = ["IndexManifest", "PartitionRecord"]
