"""Lock-provider seam for multi-writer OCC (reference M14:
`demo/config/test-suite/multi-writer-1.properties:38-44` configures
`hoodie.write.concurrency.mode=optimistic_concurrency_control` with a
pluggable `ZookeeperBasedLockProvider`; single-node runs use a
filesystem lock via `hoodie.fs.atomic_creation.support=s3a`).

The commit timeline and the format-personality exporters need three
storage primitives, named here so the storage-specific implementation
is swappable:

1. **Conditional create** (`try_lock`/`unlock`/`lock_age_s`/`list`) —
   create an entity iff absent. Used for instant-id reservation
   markers. Object stores: S3 `PutObject` + `If-None-Match: *`
   (the capability `hoodie.fs.atomic_creation.support=s3a` gates in
   the reference's Hudi config), GCS `x-goog-if-generation-match: 0`,
   Azure `If-None-Match: *`, or DynamoDB conditional `PutItem`.
2. **Conditional publish with content** (`publish`) — conditional
   create whose payload is visible ATOMICALLY (readers never observe
   a partial entity). Used for Delta log versions and Iceberg
   metadata versions, whose readers may race the writer. Local FS:
   write a temp file, `os.link` it into place (link fails if the name
   exists; the linked content is complete by construction). Object
   stores: a conditional put IS this primitive (objects appear
   atomically).
3. **Mutex** (`acquire_mutex`/`release_mutex`) — a liveness-backed
   exclusive section for validate+publish. Local FS: `flock`, which
   the kernel releases when the holder dies — no staleness heuristic
   and no break race at all. Providers without native liveness
   inherit the generic loop below (conditional create + staleness
   breaking); its stale-break carries an unavoidable narrow race
   (breaker may delete a lock refreshed between its age check and its
   delete), which is why implementations with a real lease/liveness
   primitive (flock, Zookeeper ephemeral nodes, DynamoDB lease
   heartbeats) must override it.

Locks are held only for driver-side metadata validation plus one
atomic publish — milliseconds — never across data writes.
"""

from __future__ import annotations

import os
import time
import uuid


class LockProvider:
    """See module docstring for the three primitives and their
    object-store implementations."""

    #: A generic-loop mutex holder older than this is assumed dead and
    #: is broken (only used by the inherited acquire_mutex fallback —
    #: liveness-backed implementations never consult it).
    MUTEX_STALE_S = 600.0

    # -- conditional create ------------------------------------------------

    def try_lock(self, name: str, payload: str = "") -> bool:
        """Atomically create lock entity `name` iff absent; True on
        success, False when another holder exists. Must never block."""
        raise NotImplementedError

    def unlock(self, name: str) -> None:
        """Remove the lock entity (idempotent)."""
        raise NotImplementedError

    def lock_age_s(self, name: str) -> float | None:
        """Seconds since the lock entity was created, or None if it
        does not exist."""
        raise NotImplementedError

    def list(self, suffix: str = "") -> list[str]:
        """Names of existing lock entities (optionally filtered by
        suffix). Lets timeline logic (in-flight discovery, orphan-clean
        shielding) see reservations wherever the provider stores them."""
        raise NotImplementedError

    def read(self, name: str) -> bytes | None:
        """Payload of a published entity, or None if absent. The READ
        half of `publish` — persisted maintenance plans
        (`<instant>.compaction.requested` etc.) are rehydrated through
        this, so the schedule→show→run lifecycle is portable to object
        stores: both halves go through the provider, never a local
        `open()`. Object stores: GetObject."""
        raise NotImplementedError

    # -- conditional publish with content ----------------------------------

    def publish(self, name: str, payload: str | bytes) -> bool:
        """Create entity `name` with `payload` iff absent, atomically:
        a reader must never observe the name without the full payload.
        True on success, False if the name already exists."""
        raise NotImplementedError

    # -- mutex -------------------------------------------------------------

    def acquire_mutex(self, name: str, timeout_s: float = 60.0) -> None:
        """Generic fallback built on the conditional-create primitives.
        Carries the documented stale-break race — override with a
        liveness-backed implementation where the store offers one."""
        deadline = time.time() + timeout_s
        while True:
            if self.try_lock(name):
                return
            age = self.lock_age_s(name)
            if age is None:
                continue  # holder just released — retry immediately
            if age > self.MUTEX_STALE_S:
                self.unlock(name)  # break a dead holder (racy; see doc)
                continue
            if time.time() > deadline:
                raise RuntimeError(f"timed out waiting for mutex {name!r}")
            time.sleep(0.01)

    def release_mutex(self, name: str) -> None:
        self.unlock(name)

    # -- namespacing -------------------------------------------------------

    def scoped(self, root: str) -> "LockProvider":
        """A provider over the same store rooted at a different
        namespace (e.g. the table's `_delta_log/` next to its
        `_commits/`). No silent fallback: providers must implement
        this so personality exporters inherit the real store."""
        raise NotImplementedError


class LocalFSLockProvider(LockProvider):
    """POSIX implementation: O_EXCL conditional create, tmp+hardlink
    atomic publish, flock mutex (kernel-released on process death —
    raceless, no staleness heuristic)."""

    def __init__(self, root: str):
        self.root = root
        self._mutex_fds: dict[str, int] = {}

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    # -- conditional create ------------------------------------------------

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

    def list(self, suffix: str = "") -> list[str]:
        try:
            names = os.listdir(self.root)
        except FileNotFoundError:
            return []
        return sorted(n for n in names if n.endswith(suffix))

    def read(self, name: str) -> bytes | None:
        try:
            with open(self._path(name), "rb") as fh:
                return fh.read()
        except FileNotFoundError:
            return None

    # -- conditional publish with content ----------------------------------

    def publish(self, name: str, payload: str | bytes) -> bool:
        data = payload.encode() if isinstance(payload, str) else payload
        os.makedirs(self.root, exist_ok=True)
        tmp = self._path(f".{name}.{uuid.uuid4().hex}.tmp")
        with open(tmp, "wb") as fh:
            fh.write(data)
        try:
            # hardlink = create-if-absent with the COMPLETE content:
            # the target name appears only after the bytes exist
            os.link(tmp, self._path(name))
            return True
        except FileExistsError:
            return False
        finally:
            os.remove(tmp)

    # -- mutex (flock) -----------------------------------------------------

    def acquire_mutex(self, name: str, timeout_s: float = 60.0) -> None:
        import fcntl

        path = self._path(name)
        os.makedirs(self.root, exist_ok=True)
        fd = os.open(path, os.O_CREAT | os.O_RDWR)
        deadline = time.time() + timeout_s
        while True:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                os.ftruncate(fd, 0)
                os.write(fd, str(os.getpid()).encode())
                self._mutex_fds[name] = fd
                return
            except BlockingIOError:
                if time.time() > deadline:
                    os.close(fd)
                    raise RuntimeError(
                        f"timed out waiting for mutex {name!r}"
                    )
                time.sleep(0.01)

    def release_mutex(self, name: str) -> None:
        import fcntl

        fd = self._mutex_fds.pop(name, None)
        if fd is None:
            return
        fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)

    # -- namespacing -------------------------------------------------------

    def scoped(self, root: str) -> "LocalFSLockProvider":
        return LocalFSLockProvider(root)


# ---------------------------------------------------------------- S3 contract


class ObjectStoreClient:
    """The S3 data-plane contract the provider below is allowed to
    use — NOTHING else (no rename, no hardlink, no flock, no append):

    - ``put_object(key, data, if_none_match)``: atomic full-object
      write. With ``if_none_match=True`` it maps to S3
      `PutObject + If-None-Match: *` (conditional write, GA Nov 2024;
      same semantic as GCS `x-goog-if-generation-match: 0` / Azure
      `If-None-Match: *`) and returns False when the key already
      exists. Objects appear atomically with their full content.
    - ``head_object(key)``: metadata probe -> {'last_modified': epoch
      seconds} or None.
    - ``delete_object(key)``: idempotent delete.
    - ``list_keys(prefix)``: LIST with prefix.
    """

    def put_object(self, key: str, data: bytes, if_none_match: bool = False) -> bool:
        raise NotImplementedError

    def put_object_from_file(
        self, key: str, src_path: str, if_none_match: bool = False
    ) -> bool:
        """Full-object PUT streamed from a local file (S3 upload_file).
        Default implementation reads the bytes; emulators may override
        with a zero-copy path (hardlink) — the CALLER still sees only
        the S3 contract."""
        with open(src_path, "rb") as fh:
            return self.put_object(key, fh.read(), if_none_match=if_none_match)

    def get_object(self, key: str) -> bytes | None:
        raise NotImplementedError

    def head_object(self, key: str) -> dict | None:
        raise NotImplementedError

    def delete_object(self, key: str) -> None:
        raise NotImplementedError

    def list_keys(
        self, prefix: str, delimiter: str | None = None
    ) -> list[str]:
        """LIST with prefix. ``delimiter="/"`` is S3 ListObjectsV2
        delimiter semantics restricted to what the writers need: only
        keys with no further delimiter after the prefix are returned
        (direct children; rolled-up CommonPrefixes are omitted). The
        timeline minter lists `.hoodie/` per instant mint — without
        the delimiter a hierarchical store pays O(metadata keyspace)
        walking HFile/log partitions and archives it never wanted
        (r13 review)."""
        raise NotImplementedError


class FSObjectStoreEmulator(ObjectStoreClient):
    """Filesystem emulation of the S3 contract for tests/local runs:
    a FLAT keyspace (keys are url-encoded into one directory — no
    directory semantics, exactly like a bucket), conditional put via
    O_EXCL + hardlink so the emulated object appears atomically with
    its complete payload, unconditional put via tmp + rename. The
    PROVIDER never touches these primitives — it sees only the
    client contract above, so swapping in a boto3-backed client is a
    constructor change."""

    def __init__(self, bucket_dir: str):
        self.bucket_dir = bucket_dir
        os.makedirs(bucket_dir, exist_ok=True)

    def _obj(self, key: str) -> str:
        from urllib.parse import quote

        return os.path.join(self.bucket_dir, quote(key, safe=""))

    def put_object(self, key: str, data: bytes, if_none_match: bool = False) -> bool:
        tmp = os.path.join(
            self.bucket_dir, f".put.{uuid.uuid4().hex}.tmp"
        )
        with open(tmp, "wb") as fh:
            fh.write(data)
        try:
            if if_none_match:
                try:
                    os.link(tmp, self._obj(key))  # emulates the
                    # store-side atomic create-if-absent
                    return True
                except FileExistsError:
                    return False
            os.rename(tmp, self._obj(key))
            tmp = None
            return True
        finally:
            if tmp is not None and os.path.exists(tmp):
                os.remove(tmp)

    def get_object(self, key: str) -> bytes | None:
        try:
            with open(self._obj(key), "rb") as fh:
                return fh.read()
        except FileNotFoundError:
            return None

    def head_object(self, key: str) -> dict | None:
        try:
            return {"last_modified": os.path.getmtime(self._obj(key))}
        except FileNotFoundError:
            return None

    def delete_object(self, key: str) -> None:
        try:
            os.remove(self._obj(key))
        except FileNotFoundError:
            pass

    def list_keys(
        self, prefix: str, delimiter: str | None = None
    ) -> list[str]:
        from urllib.parse import unquote

        out = []
        for n in os.listdir(self.bucket_dir):
            if n.startswith(".put."):
                continue
            key = unquote(n)
            if not key.startswith(prefix):
                continue
            if delimiter and delimiter in key[len(prefix):]:
                continue  # rolled up behind a CommonPrefix
            out.append(key)
        return sorted(out)


class TreeFSObjectStoreEmulator(ObjectStoreClient):
    """Filesystem emulation of the S3 contract with a HIERARCHICAL
    keyspace: keys are bucket-relative POSIX paths materialized as
    real files under ``root`` (parent directories are an emulation
    artifact — S3 has no directories). This is the default store for
    the Hudi-personality publisher (VERDICT r11 #3): the layout
    external Hudi readers scan is byte-identical to the pre-seam
    direct writes, while the PERSONALITY code sees only atomic
    full-object puts — conditional put (O_EXCL-linked) for commit
    points, tmp+rename INSIDE the emulator for overwrites, hardlink
    for the zero-copy file upload. Picklable (holds only the root
    path) so Spark executors can publish shard files through the same
    contract."""

    def __init__(self, root: str):
        self.root = root

    def _obj(self, key: str) -> str:
        if key.startswith("/") or ".." in key.split("/"):
            raise ValueError(f"object key escapes the bucket: {key!r}")
        return os.path.join(self.root, *key.split("/"))

    def _tmp(self, dst: str) -> str:
        return os.path.join(
            os.path.dirname(dst), f".put.{uuid.uuid4().hex}.tmp"
        )

    def put_object(self, key: str, data: bytes, if_none_match: bool = False) -> bool:
        dst = self._obj(key)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        tmp = self._tmp(dst)
        with open(tmp, "wb") as fh:
            fh.write(data)
        try:
            if if_none_match:
                try:
                    os.link(tmp, dst)  # store-side atomic create-if-absent
                    return True
                except FileExistsError:
                    return False
            os.rename(tmp, dst)
            tmp = None
            return True
        finally:
            if tmp is not None and os.path.exists(tmp):
                os.remove(tmp)

    def put_object_from_file(
        self, key: str, src_path: str, if_none_match: bool = False
    ) -> bool:
        # PRECONDITION (ADVICE r12 #2): the zero-copy path hardlinks
        # the live source inode as the stored object, so a later
        # in-place MUTATION of src_path would mutate the "immutable"
        # object — diverging from S3. Safe here because every caller
        # uploads write-once engine artifacts (parquet base files,
        # sealed log blocks, HFiles); a source that is later rewritten
        # in place must go through put_object(bytes) instead.
        dst = self._obj(key)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        if if_none_match:
            try:
                os.link(src_path, dst)
                return True
            except FileExistsError:
                return False
            except OSError:
                return super().put_object_from_file(
                    key, src_path, if_none_match=True
                )
        tmp = self._tmp(dst)
        try:
            try:
                os.link(src_path, tmp)  # one inode, zero copied bytes
            except OSError:  # cross-device: fall back to a byte copy
                import shutil

                shutil.copy2(src_path, tmp)
            os.rename(tmp, dst)
            tmp = None
            return True
        finally:
            if tmp is not None and os.path.exists(tmp):
                os.remove(tmp)

    def get_object(self, key: str) -> bytes | None:
        # NotADirectoryError: a key path traversing an existing object
        # (GET a/b after PUT a) is just another nonexistent key on S3
        try:
            with open(self._obj(key), "rb") as fh:
                return fh.read()
        except (FileNotFoundError, IsADirectoryError, NotADirectoryError):
            return None

    def head_object(self, key: str) -> dict | None:
        p = self._obj(key)
        try:
            if os.path.isdir(p):
                return None
            return {"last_modified": os.path.getmtime(p)}
        except (FileNotFoundError, NotADirectoryError):
            return None

    def delete_object(self, key: str) -> None:
        # like GET/HEAD: a key path traversing an existing object is a
        # nonexistent key — S3 DeleteObject succeeds on those
        try:
            os.remove(self._obj(key))
        except (FileNotFoundError, IsADirectoryError, NotADirectoryError):
            pass

    def list_keys(
        self, prefix: str, delimiter: str | None = None
    ) -> list[str]:
        # Walk only the subtree the prefix's directory part names —
        # S3 LIST with a prefix is server-side efficient, and callers
        # (e.g. the instant minter listing `.hoodie/`) must not pay
        # O(whole table) for a metadata-directory listing.
        dir_part = prefix.rpartition("/")[0]
        start = (
            os.path.join(self.root, *dir_part.split("/"))
            if dir_part
            else self.root
        )
        if not os.path.isdir(start):
            return []
        out = []
        if delimiter == "/" and prefix.endswith("/"):
            # delimiter LIST: direct children only — one readdir, no
            # recursion into metadata/archive subtrees (r13 review:
            # the per-mint timeline LIST was O(metadata keyspace))
            for n in os.listdir(start):
                if n.startswith(".put."):
                    continue
                p = os.path.join(start, n)
                if os.path.isfile(p):
                    out.append(prefix + n)
            return sorted(out)
        for dirpath, _dirs, names in os.walk(start):
            for n in names:
                if n.startswith(".put."):
                    continue
                rel = os.path.relpath(os.path.join(dirpath, n), self.root)
                key = rel.replace(os.sep, "/")
                if not key.startswith(prefix):
                    continue
                if delimiter and delimiter in key[len(prefix):]:
                    continue
                out.append(key)
        return sorted(out)


class ObjectStoreLockProvider(LockProvider):
    """M14's second concrete provider (VERDICT r4 ask #8): the three
    storage primitives built ONLY from the S3 conditional-put
    contract (`multi-writer-1.properties:38-44` configures the same
    role via ZK locks + `hoodie.fs.atomic_creation.support=s3a`).

    - conditional create / publish: `PutObject + If-None-Match: *` —
      on an object store a conditional put IS the atomic
      create-with-content primitive, so `try_lock` and `publish` are
      the same call.
    - mutex: the store has NO liveness primitive, so the base class's
      generic conditional-create loop applies, stale-break documented
      there. Production deployments wanting raceless mutexes pair
      the table with a lease-backed provider (DynamoDB/ZK) instead.
    """

    def __init__(self, client: ObjectStoreClient, prefix: str):
        self.client = client
        self.prefix = prefix.strip("/") + "/" if prefix.strip("/") else ""

    def _key(self, name: str) -> str:
        return self.prefix + name

    def try_lock(self, name: str, payload: str = "") -> bool:
        data = (payload or str(os.getpid())).encode()
        return self.client.put_object(
            self._key(name), data, if_none_match=True
        )

    def unlock(self, name: str) -> None:
        self.client.delete_object(self._key(name))

    def lock_age_s(self, name: str) -> float | None:
        head = self.client.head_object(self._key(name))
        if head is None:
            return None
        return time.time() - head["last_modified"]

    def list(self, suffix: str = "") -> list[str]:
        plen = len(self.prefix)
        return [
            k[plen:]
            for k in self.client.list_keys(self.prefix)
            if k.endswith(suffix)
        ]

    def publish(self, name: str, payload: str | bytes) -> bool:
        data = payload.encode() if isinstance(payload, str) else payload
        return self.client.put_object(
            self._key(name), data, if_none_match=True
        )

    def read(self, name: str) -> bytes | None:
        return self.client.get_object(self._key(name))

    # acquire_mutex / release_mutex: the inherited generic loop — the
    # S3 contract offers no liveness primitive to improve on it.

    def scoped(self, root: str) -> "ObjectStoreLockProvider":
        # same client (bucket), different key prefix: the personality
        # exporters inherit the real store
        return ObjectStoreLockProvider(self.client, root)
