"""Filesystem helpers shared by the index persistence layers."""

from __future__ import annotations

import json
import os
from pathlib import Path


def atomic_write_json(path: Path, obj) -> None:
    """Write ``obj`` as JSON via a temp file + ``os.replace`` so readers
    (and crash recovery) only ever see the old or the new version, never
    a partial write. Used for every manifest/sidecar commit in
    ``sema_tpu.index``."""
    tmp = path.with_suffix(".tmp")
    tmp.write_text(json.dumps(obj))
    os.replace(tmp, path)
