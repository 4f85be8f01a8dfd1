"""Deterministic test sharding (the role of the reference's 4-way tox split,
``tox.ini:60-67``): assign test files round-robin (by size, largest first) to N shards
and run one shard per invocation, so each CI job stays within a few minutes and the
suite never silently stops being run.

Usage::

    python scripts/test_shard.py <num_shards> <shard_id 0-based> [extra pytest args]

    # the full fast suite as 4 jobs (run in parallel on 4 CI executors):
    for i in 0 1 2 3; do python scripts/test_shard.py 4 $i; done
"""
from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def shard_files(num_shards: int) -> list[list[Path]]:
    files = sorted(
        list((REPO / "tests").rglob("test_*.py")),
        key=lambda p: -p.stat().st_size,
    )
    shards: list[list[Path]] = [[] for _ in range(num_shards)]
    sizes = [0] * num_shards
    for f in files:  # greedy longest-processing-time assignment by file size
        i = sizes.index(min(sizes))
        shards[i].append(f)
        sizes[i] += f.stat().st_size
    return shards


def main() -> int:
    num_shards = int(sys.argv[1])
    shard_id = int(sys.argv[2])
    extra = sys.argv[3:]
    files = shard_files(num_shards)[shard_id]
    if not files:
        print(f"shard {shard_id}/{num_shards}: no files")
        return 0
    rel = [str(f.relative_to(REPO)) for f in files]
    print(f"shard {shard_id}/{num_shards}: {len(rel)} files")
    return subprocess.call(
        [sys.executable, "-m", "pytest", "-q", *rel, *extra], cwd=REPO
    )


if __name__ == "__main__":
    sys.exit(main())
