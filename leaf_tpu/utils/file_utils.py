"""Remote/local checkpoint sync (reference
`src/open_clip_train/file_utils.py`).

The reference syncs the run dir to S3 every `--remote-sync-frequency`
seconds via aws-cli or fsspec from a background process.  Here the sync
runs on a daemon thread (no pickling constraints) and uses fsspec for
any protocol it supports, falling back to a local copy.
"""
from __future__ import annotations

import logging
import os
import shutil
import threading
import time
from typing import Optional

LOG = logging.getLogger(__name__)


def remote_sync(local_dir: str, remote_dir: str,
                protocol: str = "fsspec") -> bool:
    """One sync pass; returns success."""
    try:
        if protocol == "fsspec" and "://" in remote_dir:
            import fsspec
            fs, _, _ = fsspec.get_fs_token_paths(remote_dir)
            # trailing slash = copy CONTENTS into remote_dir (fsspec cp
            # semantics); without it the dir itself nests one level deep
            fs.put(local_dir.rstrip("/") + "/", remote_dir, recursive=True)
        else:
            os.makedirs(remote_dir, exist_ok=True)
            for root, _, files in os.walk(local_dir):
                rel = os.path.relpath(root, local_dir)
                dst_root = os.path.join(remote_dir, rel)
                os.makedirs(dst_root, exist_ok=True)
                for f in files:
                    src = os.path.join(root, f)
                    dst = os.path.join(dst_root, f)
                    if (not os.path.exists(dst)
                            or os.path.getmtime(src) > os.path.getmtime(dst)):
                        shutil.copy2(src, dst)
        return True
    except Exception as e:  # noqa: BLE001
        LOG.warning("remote sync failed: %r", e)
        return False


class SyncThread:
    """Background periodic sync (reference `start_sync_process`,
    started at `train_AT_text_only.py:193-213`)."""

    def __init__(self, local_dir: str, remote_dir: str,
                 frequency_s: float = 300.0, protocol: str = "fsspec"):
        self.local_dir = local_dir
        self.remote_dir = remote_dir
        self.frequency_s = frequency_s
        self.protocol = protocol
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def start(self):
        def loop():
            while not self._stop.wait(self.frequency_s):
                remote_sync(self.local_dir, self.remote_dir, self.protocol)

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()
        return self

    def stop(self, final_sync: bool = True):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
        if final_sync:
            remote_sync(self.local_dir, self.remote_dir, self.protocol)


def start_run_mirror(args, out_dir: str, run_name: str
                     ) -> Optional[SyncThread]:
    """Master-side remote mirroring for a run dir (reference
    `train_AT_text_only.py:193-213`): one verified sync pass (hard error
    on failure, as upstream exits), then a background thread.  Returns
    the thread (caller stops it with final_sync=True) or None when
    --remote-sync is unset."""
    if not getattr(args, "remote_sync", None):
        return None
    remote_run = os.path.join(args.remote_sync, run_name)
    if not remote_sync(out_dir, remote_run, args.remote_sync_protocol):
        raise RuntimeError(
            f"remote sync to {remote_run} failed; fix the target before "
            "training (reference exits likewise)")
    LOG.info("remote sync successful: %s", remote_run)
    return SyncThread(out_dir, remote_run,
                      frequency_s=args.remote_sync_frequency,
                      protocol=args.remote_sync_protocol).start()


def copy_codebase(out_dir: str) -> None:
    """Snapshot the leaf_tpu package into <run>/code (reference
    `copy_codebase`, `train_AT_text_only.py:590-605` — errors if the
    experiment's code dir already exists)."""
    import shutil

    import leaf_tpu
    code_dir = os.path.join(out_dir, "code")
    if os.path.exists(code_dir):
        raise FileExistsError(
            f"experiment code snapshot already exists at {code_dir}; "
            "use --name to start a new experiment")
    src = os.path.dirname(os.path.abspath(leaf_tpu.__file__))
    shutil.copytree(src, os.path.join(code_dir, "leaf_tpu"),
                    ignore=shutil.ignore_patterns("__pycache__", "*.so",
                                                  "logs", "wandb"))
    LOG.info("copied codebase to %s", code_dir)
