"""Git revision materializer (S10, de/fileutils.py:7-64, CLI de/cli.py:148-170).

Driver-side ingestion utility: `git log --follow` a file, check out every
revision as ``<stem>-<NNNN>-<rev><suffix>`` into a target directory; the
directory then becomes the engine's input path set (each revision one file,
one chunker task). Semantics unchanged from the reference — this is data
acquisition, not distributed compute.
"""

from __future__ import annotations

import subprocess
from pathlib import Path


def file_revisions(repo_dir: Path, file_path: str, from_rev: str | None = None, until_rev: str | None = None) -> list[str]:
    """Revision hashes touching ``file_path``, oldest first."""
    cmd = ["git", "log", "--follow", "--format=%H"]
    if from_rev or until_rev:
        cmd.append(f"{from_rev or ''}..{until_rev or 'HEAD'}")
    cmd += ["--", file_path]
    out = subprocess.run(
        cmd, cwd=repo_dir, check=True, capture_output=True, text=True
    ).stdout
    revs = [line.strip() for line in out.splitlines() if line.strip()]
    return list(reversed(revs))


def checkout_file_revisions(
    repo_dir: str | Path,
    file_path: str,
    target_dir: str | Path,
    from_rev: str | None = None,
    until_rev: str | None = None,
) -> list[Path]:
    """Materialize every revision of ``file_path`` into ``target_dir``.

    Returns the written paths in revision order (oldest first) — the
    file_idx order for provenance (first_seen_in = oldest revision).
    """
    repo_dir = Path(repo_dir)
    target_dir = Path(target_dir)
    target_dir.mkdir(parents=True, exist_ok=True)
    src = Path(file_path)
    written: list[Path] = []
    for i, rev in enumerate(file_revisions(repo_dir, file_path, from_rev, until_rev)):
        out = target_dir / f"{src.stem}-{i:04d}-{rev[:12]}{src.suffix}"
        blob = subprocess.run(
            ["git", "show", f"{rev}:{file_path}"],
            cwd=repo_dir,
            check=True,
            capture_output=True,
        ).stdout
        out.write_bytes(blob)
        written.append(out)
    return written
