"""Shared generation-store helpers for the on-disk index modules.

Both index lifecycles (jobs/dedup_index.py, jobs/ann_index.py) key
streaming appends by epoch as ``gen_b_<id>`` directories, and their
maintenance (compact/retrain) FOLDS those directories away. The
directory's existence doubled as the replay ledger — so folding a
generation made a later checkpoint replay of the same epoch look like a
first pass (r10 review finding: the replay then re-verdicted against an
index that already contained the batch). The fix: removal of any
``gen_b_*`` directory leaves a zero-byte tombstone under
``processed/``, written BEFORE the directory is renamed aside, so
"this epoch's data is in the index" survives every fold and the replay
test is ``directory present OR tombstone present``. Tombstones are tiny
(one empty file per folded batch), idempotent, and never read by query
paths.
"""

from __future__ import annotations

import os
import shutil
import uuid

PROCESSED = "processed"
RUN_ID_FILE = "RUN_ID"


def run_id_for_checkpoint(checkpoint: str) -> str:
    """Run id bound to the checkpoint INSTANCE, not its path.

    r10 review (ADVICE, medium): deriving the run id from md5(abspath)
    meant deleting and recreating the checkpoint directory at the same
    path — a standard stream reset — reused the old run id while the
    epoch counter restarted at 0, so the new stream's first epochs
    collided with the old run's ``gen_b_<run>-<n>`` generations and
    tombstones and were silently dropped as "replays". The fix: a
    random RUN_ID file is created inside the checkpoint directory on
    first start and read thereafter. It lives and dies WITH the
    checkpoint — a reset destroys it, so the fresh checkpoint gets a
    fresh run id and its epoch 0 can never look like the old run's.

    Creation publishes the marker ATOMICALLY WITH ITS CONTENT: the id
    is written to a private temp file first, then hard-linked to the
    marker name — link() fails with FileExistsError when a winner got
    there first, and a marker that exists is by construction complete,
    so the loser's re-read can never observe the r11 ADVICE window
    (open('x') created the name before write() filled it, and a crash
    or early concurrent read yielded an EMPTY run id → generation keys
    like 'gen_b_-0' colliding across resets). An empty marker can now
    only be a remnant of that retired scheme's crash window; with no
    live concurrent writer possible (Structured Streaming forbids two
    actives on one checkpoint), it is repaired in place by one more
    atomic publish.
    """
    os.makedirs(checkpoint, exist_ok=True)
    marker = os.path.join(checkpoint, RUN_ID_FILE)
    rid = _read_run_id(marker)
    if rid:
        return rid
    new = uuid.uuid4().hex[:8]
    tmp = marker + "." + new
    with open(tmp, "w") as f:
        f.write(new)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, marker)        # atomic create-if-absent, full content
        return new
    except FileExistsError:
        rid = _read_run_id(marker)
        if rid:
            return rid
        # exists-but-empty: legacy crash remnant, single-writer repair
        os.replace(tmp, marker)
        tmp = None
        return new
    finally:
        if tmp is not None:
            os.unlink(tmp)


def _read_run_id(marker: str) -> str | None:
    try:
        with open(marker) as f:
            rid = f.read().strip()
        return rid or None
    except FileNotFoundError:
        return None


def tombstone(index_dir: str, gen_basename: str) -> None:
    """Record that gen_basename's contents were folded into the index."""
    d = os.path.join(index_dir, PROCESSED)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, gen_basename), "w"):
        pass


def epoch_done(index_dir: str, gen_basename: str) -> bool:
    """True iff this batch generation is committed — as a live
    directory or as a folded tombstone."""
    return (os.path.isdir(os.path.join(index_dir, gen_basename))
            or os.path.exists(
                os.path.join(index_dir, PROCESSED, gen_basename)))


def remove_gen(gen_dir: str) -> bool:
    """Rename-aside + rmtree one generation directory, tombstoning
    batch (``gen_b_*``) generations first. Returns False when a
    concurrent/previous cleanup already removed it."""
    index_dir = os.path.dirname(gen_dir)
    base = os.path.basename(gen_dir)
    if base.startswith("gen_b_"):
        tombstone(index_dir, base)
    aside = os.path.join(index_dir, "_old_" + base)
    try:
        os.rename(gen_dir, aside)
    except OSError:
        return False
    shutil.rmtree(aside)
    return True
