"""Commit-primitive abstraction for the snapshot/vector-store layers.

The lakehouse layer's correctness rests on ONE primitive: atomically
publishing a small metadata object (a manifest / generation pointer) so
that concurrent readers see either the old table version or the new one,
never a half state, and concurrent writers race to a single winner. What
implements that primitive is SCHEME-SPECIFIC:

- **posix** (bare paths, ``file://``, HDFS-like stores with atomic
  metadata ops): ``os.link`` gives create-exclusive publication — the
  link target carries the tmp file's COMPLETE content the instant it
  appears, and EEXIST names the commit loser. Directory swaps via
  ``os.rename`` are atomic.
- **object** (``s3://``, ``s3a://``, ``gs://``, ``abfs[s]://``,
  ``oss://``, ``wasb[s]://``): there is NO rename — "rename" in
  Hadoop-style clients is copy+delete, a long non-atomic window — and no
  hardlinks. The commit primitive there is a **conditional put**
  (S3 ``If-None-Match: *``, GCS ``x-goog-if-generation-match: 0``,
  Azure ``If-None-Match: *``): the object appears fully-written or not
  at all, and exactly one concurrent writer succeeds. This module's
  local implementation models that contract with a single-shot
  ``O_CREAT | O_EXCL`` write + fsync (the emulation's partial-read
  window during the write does not exist on a real object store, where
  the put is all-or-nothing server-side); a real deployment swaps
  ``_conditional_put`` for the store SDK call.

Consumers (see BASELINE.md "Commit protocol" note):

- ``layout._commit_manifest`` — snapshot manifests (``v{N}.json``).
- ``vector_store.index_compact`` — posix scheme swaps directories by
  rename (with ``_recover_compact`` crash repair); object scheme never
  renames: it writes the compacted store into a fresh generation
  directory and publishes a generation pointer through THIS primitive.

``SPARK_GRAFT_COMMIT_BACKEND`` (``posix`` | ``object``) overrides scheme
detection — the lever tests use to exercise the object protocol on local
disk, and deployments can use to force a strategy.
"""

from __future__ import annotations

import os

# URL schemes whose stores lack atomic rename/hardlink: commit goes
# through the conditional-put strategy. hdfs/file/viewfs keep posix-class
# semantics (HDFS rename IS atomic).
_OBJECT_SCHEMES = frozenset(
    {"s3", "s3a", "s3n", "gs", "gcs", "abfs", "abfss", "oss", "wasb",
     "wasbs", "cos", "r2"}
)


def commit_scheme(path: str) -> str:
    """``"posix"`` or ``"object"`` for a table/store root path."""
    forced = os.environ.get("SPARK_GRAFT_COMMIT_BACKEND")
    if forced:
        if forced not in ("posix", "object"):
            raise ValueError(
                f"SPARK_GRAFT_COMMIT_BACKEND must be posix|object, got {forced!r}"
            )
        return forced
    scheme, sep, _ = path.partition("://")
    return "object" if (sep and scheme.lower() in _OBJECT_SCHEMES) else "posix"


def _conditional_put(tmp: str, final: str) -> None:
    """Local model of an object store's conditional create: publish the
    bytes of `tmp` at `final` iff `final` does not exist. Raises
    FileExistsError on conflict. On a real object store this is ONE
    conditional PUT (all-or-nothing server-side); locally O_EXCL claims
    the name atomically and the content follows."""
    fd = os.open(final, os.O_WRONLY | os.O_CREAT | os.O_EXCL, 0o644)
    try:
        with open(tmp, "rb") as src:
            data = src.read()
        os.write(fd, data)
        os.fsync(fd)
    except BaseException:
        # a failed content write (disk full, interrupt) must not leave a
        # PARTIAL object claiming the version: later retries would lose
        # the create-exclusive race to a corrupt winner forever. A real
        # object store cannot hit this (the put is all-or-nothing); the
        # local emulation repairs it by withdrawing the claimed name.
        os.close(fd)
        try:
            os.unlink(final)
        except OSError:
            pass
        raise
    else:
        os.close(fd)


def publish_exclusive(tmp: str, final: str, scheme: str | None = None) -> None:
    """Atomically publish the fully-written local file `tmp` at `final`.

    Create-exclusive: raises FileExistsError when `final` already exists
    (the optimistic-concurrency loser signal). On success `tmp` is
    consumed. NEVER implemented with rename — the posix strategy links
    (content-complete at link time), the object strategy conditional-puts
    — so the protocol holds on stores where rename is copy+delete."""
    if scheme is None:
        scheme = commit_scheme(final)
    if scheme == "object":
        _conditional_put(tmp, final)
    else:
        os.link(tmp, final)  # atomic create-exclusive: EEXIST on conflict
    os.unlink(tmp)
