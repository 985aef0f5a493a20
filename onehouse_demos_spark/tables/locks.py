"""Lock-provider seam for multi-writer OCC (reference M14:
`demo/config/test-suite/multi-writer-1.properties:38-44` configures
`hoodie.write.concurrency.mode=optimistic_concurrency_control` with a
pluggable `ZookeeperBasedLockProvider`; single-node runs use a
filesystem lock via `hoodie.fs.atomic_creation.support=s3a`).

The commit timeline needs exactly one primitive for correctness:
**create-if-absent with atomic visibility** ("conditional put"). Both
the instant-id reservation and the validate+publish critical section
reduce to it. This module names that primitive as a provider interface
so the storage-specific implementation is swappable:

- `LocalFSLockProvider` — POSIX `O_CREAT|O_EXCL`, correct on any
  local/NFSv4 filesystem. The default; what tests exercise.
- Object stores — implement `try_lock` with the store's conditional
  write and `unlock` with delete:
    * S3 (Nov-2024+ API): `PutObject` with `If-None-Match: *`
      (the same capability `hoodie.fs.atomic_creation.support=s3a`
      gates in the reference's Hudi config);
    * GCS: `x-goog-if-generation-match: 0`; Azure: `If-None-Match: *`;
    * or an external lock table (DynamoDB conditional `PutItem` with
      `attribute_not_exists`), mirroring the reference's
      Zookeeper/DynamoDB lock-provider options.
  Providers must also report `lock_age_s` so a dead writer's lock can
  be broken after `Timeline.LOCK_STALE_S` (object stores: read the
  lock object's creation time).

The provider carries NO lease/renewal logic by design: locks are held
only for driver-side metadata validation plus one atomic publish —
milliseconds — never across data writes, so a coarse staleness bound
is sufficient (same stance as the reference's
`FileSystemBasedLockProvider`).
"""

from __future__ import annotations

import os
import time


class LockProvider:
    """Create-if-absent lock entities, named relative to one table's
    commit directory. See module docstring for the contract and the
    object-store implementations."""

    def try_lock(self, name: str, payload: str = "") -> bool:
        """Atomically create lock entity `name` iff absent; True on
        success, False when another holder exists. Must never block."""
        raise NotImplementedError

    def unlock(self, name: str) -> None:
        """Remove the lock entity (idempotent)."""
        raise NotImplementedError

    def lock_age_s(self, name: str) -> float | None:
        """Seconds since the lock entity was created, or None if it
        does not exist (used for stale-holder breaking)."""
        raise NotImplementedError


class LocalFSLockProvider(LockProvider):
    """POSIX exclusive-create implementation (the conditional put of a
    local filesystem)."""

    def __init__(self, root: str):
        self.root = root

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def try_lock(self, name: str, payload: str = "") -> bool:
        try:
            fd = os.open(
                self._path(name), os.O_CREAT | os.O_EXCL | os.O_WRONLY
            )
        except FileExistsError:
            return False
        try:
            os.write(fd, (payload or str(os.getpid())).encode())
        finally:
            os.close(fd)
        return True

    def unlock(self, name: str) -> None:
        try:
            os.remove(self._path(name))
        except FileNotFoundError:
            pass

    def lock_age_s(self, name: str) -> float | None:
        try:
            return time.time() - os.path.getmtime(self._path(name))
        except FileNotFoundError:
            return None
