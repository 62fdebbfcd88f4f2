"""TableMetaClient — entry object for a table's metadata.

Reference: hudi-common/.../table/HoodieTableMetaClient.java:73-77 (``.hoodie``
METAFOLDER), :281 (initTableType); HoodieTableConfig.java (``hoodie.properties``
→ ours is ``table_properties.json``).
"""

from __future__ import annotations

import json
import os
from typing import Optional

from .config import TableConfig
from .timeline import Timeline

META_FOLDER = ".hoodie"
PROPS_FILE = "table_properties.json"
DATA_FOLDER = "data"


class TableMetaClient:
    def __init__(self, base_path: str):
        self.base_path = base_path.rstrip("/")
        self.meta_path = os.path.join(self.base_path, META_FOLDER)
        self.timeline = Timeline(self.meta_path)
        self._config: Optional[TableConfig] = None

    # ---- lifecycle -----------------------------------------------------
    @staticmethod
    def initialize(base_path: str, config: TableConfig) -> "TableMetaClient":
        mc = TableMetaClient(base_path)
        os.makedirs(mc.meta_path, exist_ok=True)
        os.makedirs(os.path.join(mc.base_path, DATA_FOLDER), exist_ok=True)
        props = os.path.join(mc.meta_path, PROPS_FILE)
        tmp = props + ".tmp"
        with open(tmp, "w") as f:
            json.dump(config.to_json(), f, indent=2)
        os.replace(tmp, props)
        mc._config = config
        return mc

    @staticmethod
    def exists(base_path: str) -> bool:
        return os.path.exists(os.path.join(base_path, META_FOLDER, PROPS_FILE))

    @property
    def config(self) -> TableConfig:
        if self._config is None:
            with open(os.path.join(self.meta_path, PROPS_FILE)) as f:
                self._config = TableConfig.from_json(json.load(f))
        return self._config

    def update_config(self, config: TableConfig) -> None:
        props = os.path.join(self.meta_path, PROPS_FILE)
        tmp = props + ".tmp"
        with open(tmp, "w") as f:
            json.dump(config.to_json(), f, indent=2)
        os.replace(tmp, props)
        self._config = config

    # ---- paths ---------------------------------------------------------
    @property
    def data_path(self) -> str:
        return os.path.join(self.base_path, DATA_FOLDER)

    def instant_data_dir(self, instant_time: str) -> str:
        """Each write lands in its own immutable directory — no renames,
        no listing; the commit manifest is the source of truth."""
        return os.path.join(self.data_path, instant_time)

    def abs_path(self, rel: str) -> str:
        return os.path.join(self.base_path, rel)

    def rel_path(self, abs_p: str) -> str:
        return os.path.relpath(abs_p, self.base_path)
