"""Multi-pipeline manager — the ``benthos streams`` analogue.

The reference's streams mode runs a mutable map of named streams, each
an independent input→pipeline→output (``⟨upstream:
internal/stream/manager.go⟩``, managed over REST).  Here the manager is
a plain registry of named pipeline configs, created/updated/removed
programmatically; ``run`` executes one stream, ``run_all`` executes
every stream (sequentially — each pipeline's internal parallelism
already saturates the cluster; interleave with background Ray tasks if
wanted).
"""

from __future__ import annotations

from typing import Any

from rayflow.pipeline import Pipeline


class StreamManager:
    def __init__(self):
        self._streams: dict[str, Pipeline] = {}
        self._configs: dict[str, dict] = {}

    def add(self, name: str, conf: dict) -> None:
        """Create or replace a named stream (the POST /streams/{id}
        analogue).  Config errors surface here, at registration."""
        self._streams[name] = Pipeline.from_dict(conf)
        self._configs[name] = conf

    def add_yaml(self, name: str, yaml_text_or_path: str) -> None:
        import yaml

        from rayflow.pipeline import from_yaml

        self._streams[name] = from_yaml(yaml_text_or_path)
        self._configs[name] = yaml.safe_load(yaml_text_or_path) \
            if "\n" in yaml_text_or_path else {"path": yaml_text_or_path}

    def remove(self, name: str) -> bool:
        self._configs.pop(name, None)
        return self._streams.pop(name, None) is not None

    def names(self) -> list[str]:
        return sorted(self._streams)

    def config(self, name: str) -> dict:
        return self._configs[name]

    def run(self, name: str, ds=None) -> Any:
        return self._streams[name].run(ds)

    def run_all(self) -> dict[str, Any]:
        return {name: self._streams[name].run() for name in self.names()}
