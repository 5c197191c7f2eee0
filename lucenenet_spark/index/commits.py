"""Commit-point selection — contrib/Core SegmentsGenCommit analogue.

The reference opens an index at the generation recorded in the
``segments.gen`` file INSTEAD of the highest generation a directory
listing finds (src/contrib/Core/Index/SegmentsGenCommit.cs:37-128).  The
use case it documents: an index snapshot is copied over an existing
checkpoint and the authoritative generation is now LOWER than stale
higher-numbered files left behind — the pointer file, not the listing,
names the truth.  The pointer is only trusted when its two generation
copies agree (SegmentsGenCommit.cs:99-121 reads gen0/gen1 and requires
``gen0 == gen1`` — the lockless-commit consistency check of
SegmentInfos.FORMAT_LOCKLESS).

Here a checkpointed build's wave directories are the generations and
``segments.gen.json`` is the pointer: every wave commit rewrites it with
the wave number stored twice; resume with ``use_segments_gen=True``
(build_segmented_index) trusts the consistent pointer over the
``wave_*`` listing.
"""

from __future__ import annotations

import json
import os

SEGMENTS_GEN = "segments.gen.json"

#: pointer format tag (the FORMAT_LOCKLESS role in SegmentsGenCommit.cs:108)
FORMAT = 1


def write_segments_gen(ckpt: str, wave: int) -> None:
    """Atomically (write + rename) record `wave` as the authoritative
    generation, stored twice like the reference's gen0/gen1 pair so a
    torn write is detectable."""
    tmp = os.path.join(ckpt, SEGMENTS_GEN + ".tmp")
    with open(tmp, "w") as f:
        json.dump({"version": FORMAT, "gen0": int(wave),
                   "gen1": int(wave)}, f)
    os.replace(tmp, os.path.join(ckpt, SEGMENTS_GEN))


def read_segments_gen(ckpt: str) -> int | None:
    """The pointer generation, or None when the file is missing, has the
    wrong format tag, or gen0 != gen1 (inconsistent — the caller falls
    back to the directory listing, mirroring how core Lucene survives a
    bad segments.gen)."""
    path = os.path.join(ckpt, SEGMENTS_GEN)
    try:
        with open(path) as f:
            d = json.load(f)
    except (OSError, ValueError):
        return None
    if d.get("version") != FORMAT or d.get("gen0") != d.get("gen1"):
        return None
    return int(d["gen0"])


def segments_gen_commit(ckpt: str) -> int | None:
    """SegmentsGenCommit: the consistent pointer generation, verified to
    name an actually-committed wave (its _COMMITTED marker exists);
    None -> caller uses the listing."""
    gen = read_segments_gen(ckpt)
    if gen is None:
        return None
    marker = os.path.join(ckpt, f"wave_{gen:03d}", "_COMMITTED.json")
    return gen if os.path.exists(marker) else None
