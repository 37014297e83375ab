"""Archive-container enumeration for binary columns.

WebDataset-style tar shards are the de-facto container for large
multimodal training corpora: one tar per shard, one file-pair (or
triple) per sample. Enumerating members — (name, offset, size) —
requires only the fixed 512-byte ustar header layout (stdlib-free
struct walk), which is how real loaders index shards without
unpacking them; the offsets let a reader range-request exactly one
member out of object storage.

Checksums are deliberately NOT validated: this is the listing fast
path. Compressed shards (.tar.gz) would decompress through stdlib
zlib first; sparse/PAX extensions are out of scope and skipped by
typeflag.
"""

from __future__ import annotations

BLOCK = 512


def parse_tar_members(data: bytes) -> list[dict]:
    """Walk ustar headers → [{name, offset, size, typeflag}] where
    ``offset`` is the byte position of the member's DATA. Stops at
    the conventional zero block or truncated trailer; malformed size
    fields end the walk rather than raising (a listing over a corrupt
    shard returns the valid prefix)."""
    out: list[dict] = []
    i, n = 0, len(data)
    while i + BLOCK <= n:
        hdr = data[i : i + BLOCK]
        if hdr[0] == 0:  # end-of-archive zero block
            break
        raw_size = hdr[124:136].split(b"\0")[0].strip()
        try:
            size = int(raw_size or b"0", 8)
        except ValueError:
            break
        name = hdr[:100].split(b"\0", 1)[0].decode("utf-8", "replace")
        out.append(
            {
                "name": name,
                "offset": i + BLOCK,
                "size": size,
                "typeflag": chr(hdr[156]),
            }
        )
        i += BLOCK + ((size + BLOCK - 1) // BLOCK) * BLOCK
    return out


def member_bytes(data: bytes, member: dict) -> bytes:
    """Slice one member's payload out of the shard (the in-memory
    analog of an object-store range request)."""
    return data[member["offset"] : member["offset"] + member["size"]]
