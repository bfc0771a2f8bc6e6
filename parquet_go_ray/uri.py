"""One place for URI-vs-local-path dispatch.

The scheme sniff and ``file://`` normalization rules live HERE only;
`formats/par1._fs_open` and `pipelines/native_io._fs_of` are thin wrappers,
so a future rule change (new scheme handling, per-backend open options)
cannot silently diverge between the format layer and the dataset layer.
No Ray/pyarrow imports — the format modules stay usable without them.
"""

from __future__ import annotations


def split_uri(path: str):
    """(fsspec_fs | None, plain_path, scheme_prefix) — None fs means local.

    scheme_prefix re-qualifies fs-relative paths back into URIs so every
    downstream open routes through the same backend."""
    if "://" in path and not path.startswith("file://"):
        import fsspec

        fs, plain = fsspec.core.url_to_fs(path)
        return fs, plain, path[: path.index("://") + 3]
    return None, path[len("file://") :] if path.startswith("file://") else path, ""


def open_any(path: str, mode: str):
    """Open a local path or any fsspec URI (s3://, gs://, memory://, ...).

    Object stores publish atomically on CLOSE (S3 PUT / multipart-complete;
    fsspec memory commits at close), so remote writers target the final name
    directly — rename-based atomic publish is a local-filesystem idiom only."""
    fs, plain, _ = split_uri(path)
    if fs is not None:
        return fs.open(plain, mode)
    return open(plain, mode)
