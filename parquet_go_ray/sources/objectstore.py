"""A local S3-semantics stand-in filesystem for integration-testing the
engine's object-store paths without network access.

The reference ecosystem swaps `ParquetFile` backends (source/source.go:9-16
contract: local/S3/GCS/HDFS/mem behind one open/seek/read interface); this
engine routes every footer/page read and part write through fsspec URIs
(`formats/par1.py::_fs_open`, `pipelines/native_io.py::_fs_of`).  The cloud
backends themselves are fsspec's (s3fs/gcsfs — not installable in this
sandbox), so `mocks3://` provides the SEMANTICS those backends expose, backed
by local disk (shared across Ray worker processes, unlike `memory://`):

- **No rename.** `mv` raises — code that assumes tmp+rename atomic publish
  breaks loudly here, exactly as it would on S3.
- **PUT-on-close.** A key written via `open(..., "wb")` stages invisibly and
  appears in listings/`exists` only when the writer closes — the atomicity
  model object-store writers must build on.
- **No directories.** `mkdir`/`makedirs` are no-ops; "directories" exist only
  as key prefixes with children, as on S3.

Keys `mocks3://bucket/a/b.parquet` map to `$PGR_MOCKS3_ROOT/bucket/a/b.parquet`
(default `/tmp/pgr_mocks3`).  Registered lazily via
`fsspec.register_implementation` in the package `__init__`, so Ray workers
that import any engine module can resolve the scheme too.
"""

from __future__ import annotations

import io
import os
import posixpath
import tempfile

from fsspec import AbstractFileSystem

_DEFAULT_ROOT = "/tmp/pgr_mocks3"


class _PutOnClose(io.FileIO):
    """Stages to a hidden file; the key materializes atomically at close()
    (S3 PUT / multipart-complete semantics)."""

    def __init__(self, final_path: str, staging_dir: str):
        os.makedirs(staging_dir, exist_ok=True)
        fd, self._tmp = tempfile.mkstemp(dir=staging_dir, suffix=".put")
        self._final = final_path
        super().__init__(fd, "wb", closefd=True)

    def close(self):  # noqa: D102 — io override
        if not self.closed:
            super().close()
            os.makedirs(os.path.dirname(self._final), exist_ok=True)
            os.replace(self._tmp, self._final)


class LocalObjectStoreFS(AbstractFileSystem):
    protocol = "mocks3"
    root_marker = ""

    def __init__(self, root: str | None = None, **kwargs):
        super().__init__(**kwargs)
        self.root = root or os.environ.get("PGR_MOCKS3_ROOT", _DEFAULT_ROOT)
        self._staging = os.path.join(self.root, ".staging")

    @classmethod
    def _strip_protocol(cls, path):
        path = str(path)
        if path.startswith(cls.protocol + "://"):
            path = path[len(cls.protocol) + 3 :]
        return path.lstrip("/").rstrip("/")

    def _backing(self, path: str) -> str:
        return os.path.join(self.root, self._strip_protocol(path))

    # -- metadata ---------------------------------------------------------
    def info(self, path, **kwargs):
        key = self._strip_protocol(path)
        b = self._backing(key)
        if os.path.isfile(b):
            return {"name": key, "size": os.path.getsize(b), "type": "file"}
        if os.path.isdir(b):
            return {"name": key, "size": 0, "type": "directory"}
        raise FileNotFoundError(path)

    def exists(self, path, **kwargs):
        b = self._backing(path)
        return os.path.isfile(b) or os.path.isdir(b)

    def ls(self, path, detail=False, **kwargs):
        key = self._strip_protocol(path)
        b = self._backing(key)
        if os.path.isfile(b):
            out = [self.info(key)]
        elif os.path.isdir(b):
            out = []
            for name in sorted(os.listdir(b)):
                if key == "" and name == ".staging":
                    continue  # in-flight PUTs are invisible
                out.append(self.info(posixpath.join(key, name) if key else name))
        else:
            raise FileNotFoundError(path)
        return out if detail else [e["name"] for e in out]

    # -- data -------------------------------------------------------------
    def _open(self, path, mode="rb", **kwargs):
        b = self._backing(path)
        if "r" in mode:
            return open(b, "rb")
        if "w" in mode:
            return _PutOnClose(b, self._staging)
        raise ValueError(f"mocks3: unsupported mode {mode!r}")

    def rm_file(self, path):
        os.unlink(self._backing(path))

    # -- object stores have neither directories nor rename ---------------
    def mkdir(self, path, create_parents=True, **kwargs):
        pass

    def makedirs(self, path, exist_ok=False):
        pass

    def mv(self, path1, path2, **kwargs):
        raise NotImplementedError(
            "mocks3: object stores have no rename — write the final key directly"
        )
