"""Index catalog: versioned directories with an atomic CURRENT pointer.

This is the Spark/filesystem analogue of the reference's blue/green
alias management (``ElasticSearchIndexService.java:37-39,108-165`` picks a
free ``-0``/``-1`` suffix and atomically repoints the alias;
``IndexerMetadataServiceImpl.java:664-682`` finalizes after the >=90 %
validation gate). Here an index is a directory tree

    index_dir/
      CURRENT                  # file holding the live version name
      v0001/                   # one immutable version per build
        build_params.json      # inputs that make a build resumable
        manifest.json          # corpus stats, written at publish time
        checkpoints/batch_*.json  # per-partition lineage + metrics
        doc_stats/ postings/ term_stats/   # parquet tables

Publish = write CURRENT via atomic os.replace — readers either see the
old version or the new one, never a half-built tree. On Iceberg this maps
to a snapshot swap; the layout keeps that behind these three functions.
"""

from __future__ import annotations

import json
import os
import re


def _versions(index_dir: str) -> list[str]:
    if not os.path.isdir(index_dir):
        return []
    return sorted(d for d in os.listdir(index_dir) if re.fullmatch(r"v\d{4}", d))


def new_version_dir(index_dir: str) -> str:
    vs = _versions(index_dir)
    nxt = int(vs[-1][1:]) + 1 if vs else 1
    d = os.path.join(index_dir, f"v{nxt:04d}")
    os.makedirs(os.path.join(d, "checkpoints"), exist_ok=True)
    return d


def publish_version(index_dir: str, version_dir: str) -> None:
    """Atomically repoint CURRENT at version_dir (blue/green swap)."""
    tmp = os.path.join(index_dir, ".CURRENT.tmp")
    with open(tmp, "w") as f:
        f.write(os.path.basename(version_dir))
    os.replace(tmp, os.path.join(index_dir, "CURRENT"))


def current_version_dir(index_dir: str) -> str | None:
    cur = os.path.join(index_dir, "CURRENT")
    if not os.path.exists(cur):
        return None
    with open(cur) as f:
        name = f.read().strip()
    d = os.path.join(index_dir, name)
    return d if os.path.isdir(d) else None


def unpublished_version_dir(index_dir: str, build_params: dict) -> str | None:
    """Find an in-progress (unpublished) version whose build params match —
    the ``-running`` alias + ``beginWithUuid`` resume analogue
    (``IndexerMetadataServiceImpl.java:478-523``)."""
    cur = current_version_dir(index_dir)
    cur_name = os.path.basename(cur) if cur else None
    for v in reversed(_versions(index_dir)):
        if v == cur_name:
            continue
        p = os.path.join(index_dir, v, "build_params.json")
        if os.path.exists(p):
            with open(p) as f:
                if json.load(f) == build_params:
                    return os.path.join(index_dir, v)
    return None


def read_json(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def write_json(path: str, obj: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
    os.replace(tmp, path)
