"""Raw zarr store reading for `data-beans from-zarr`
(`data-beans/src/handlers/builders/from_zarr.rs`): numeric and string
fields at arbitrary paths inside a v2 or v3 store, directory or
``.zarr.zip`` archive (the 10x Xenium ``cell_feature_matrix.zarr.zip``
layout). tensorstore's ``zarr``/``zarr3`` drivers handle the numeric
chunks; metadata documents (``.zattrs`` / ``zarr.json``) are read
directly for attribute-stored name lists, with our v3 vlen-utf8 string
reader as a further fallback."""

from __future__ import annotations

import json
import logging
import os
import zipfile

import numpy as np

log = logging.getLogger(__name__)


def _kvstore(store_path: str, field: str) -> dict:
    field = field.strip("/")
    if os.path.isdir(store_path):
        return {"driver": "file", "path": os.path.join(store_path, field)}
    return {
        "driver": "zip",
        "base": {"driver": "file", "path": store_path},
        "path": field + "/" if field else "",
    }


def _read_meta_doc(store_path: str, rel: str) -> "dict | list | None":
    """A JSON metadata document at `rel` inside the store, or None."""
    if os.path.isdir(store_path):
        p = os.path.join(store_path, rel)
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return None
    if zipfile.is_zipfile(store_path):
        with zipfile.ZipFile(store_path) as zf:
            names = set(zf.namelist())
            for cand in (rel, rel.lstrip("/")):
                if cand in names:
                    return json.loads(zf.read(cand))
    return None


def read_zarr_numeric(store_path: str, field: str) -> np.ndarray:
    """Numeric array at `field` (v3 first, then v2)."""
    import tensorstore as ts

    errs = []
    for driver in ("zarr3", "zarr"):
        try:
            arr = ts.open(
                {"driver": driver, "kvstore": _kvstore(store_path, field)}
            ).result()
            return np.asarray(arr.read().result())
        except Exception as e:  # noqa: BLE001 - try the other driver
            errs.append(f"{driver}: {e}")
    raise FileNotFoundError(
        f"no numeric zarr array at {store_path}:{field} ({'; '.join(errs)[:300]})"
    )


def _strings_from_attr(doc) -> "list[str] | None":
    """A list of strings inside an attribute document, if there is one."""
    if isinstance(doc, list) and doc and all(isinstance(x, str) for x in doc):
        return [str(x) for x in doc]
    if isinstance(doc, dict):
        for v in doc.values():
            got = _strings_from_attr(v)
            if got is not None:
                return got
    return None


def read_zarr_strings(store_path: str, field: str) -> "list[str] | None":
    """String list at `field`: group/array attributes first
    (from_zarr.rs `read_zarr_group_attr` precedence), then a v3
    vlen-utf8 string array, then a v2 bytes/unicode array."""
    field = field.strip("/")
    # 1) attribute documents (Xenium keeps feature ids/names here)
    for rel, picker in (
        (f"{field}/.zattrs", lambda d: d),
        (f"{field}/zarr.json", lambda d: d.get("attributes", {})),
    ):
        doc = _read_meta_doc(store_path, rel)
        if doc is not None:
            got = _strings_from_attr(picker(doc))
            if got is not None:
                return got
    # parent group attrs keyed by the leaf name
    parent, _, leaf = field.rpartition("/")
    for rel, picker in (
        (f"{parent}/.zattrs", lambda d: d.get(leaf)),
        (f"{parent}/zarr.json", lambda d: d.get("attributes", {}).get(leaf)),
    ):
        doc = _read_meta_doc(store_path, rel)
        if doc is not None:
            got = _strings_from_attr(picker(doc))
            if got is not None:
                return got
    # 2) v3 string array (our own store format)
    try:
        from .zarr_strings import read_string_array

        return list(read_string_array(store_path, field))
    except Exception:  # noqa: BLE001
        pass
    # 3) v2 fixed-width bytes / unicode array
    try:
        import tensorstore as ts

        arr = np.asarray(
            ts.open(
                {"driver": "zarr", "kvstore": _kvstore(store_path, field)}
            ).result().read().result()
        )
        if arr.dtype.kind in "SU":
            return [
                x.decode() if isinstance(x, bytes) else str(x)
                for x in arr.ravel()
            ]
        if arr.dtype.kind == "u" and arr.ndim == 2 and arr.shape[1] == 2:
            return xenium_cell_ids(arr)
    except Exception:  # noqa: BLE001
        pass
    return None


def xenium_cell_ids(arr: np.ndarray) -> list[str]:
    """Xenium cell-id mapping (from_zarr.rs column_name_field note):
    [N, 2] uint32 of (id, dataset suffix) -> 8 chars over 'a'..'p'
    (one per nibble, high first) + '-{suffix}'."""
    alphabet = "abcdefghijklmnop"
    out = []
    for cid, suf in np.asarray(arr, np.uint64):
        s = "".join(
            alphabet[(int(cid) >> (4 * (7 - j))) & 0xF] for j in range(8)
        )
        out.append(f"{s}-{int(suf)}")
    return out
