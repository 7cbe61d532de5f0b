"""Index registry: global name -> VectorIndex map.

Reference: src/wagtail_vector_index/storage/registry.py:7-23 (populated at
app startup for every model with GeneratedIndexMixin, django.py:603-611).
Here registration is explicit — there's no Django app lifecycle.
"""

from __future__ import annotations

from wagtail_vector_index_spark.index import VectorIndex

_registry: dict[str, VectorIndex] = {}


def register_index(index: VectorIndex) -> VectorIndex:
    _registry[index.cfg.index_name] = index
    return index


def get_index(name: str) -> VectorIndex:
    return _registry[name]


def all_indexes() -> dict[str, VectorIndex]:
    return dict(_registry)


def rebuild_all(sources_by_index) -> None:
    """Rebuild every registered index (the update_vector_indexes management
    command, reference management/commands/update_vector_indexes.py:40-42)."""
    for name, index in _registry.items():
        if name in sources_by_index:
            index.rebuild_index(sources_by_index[name])
