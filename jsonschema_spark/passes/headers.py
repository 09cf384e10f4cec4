"""Container-header consistency pass (B53): sniff the image byte payload's
magic bytes and header-declared dimensions and check them against the
table's declared ``fmt``/``w``/``h`` columns — WITHOUT decoding pixels.

The sampled fidelity pass (passes/fidelity.py) decodes pixels and is
therefore Python-side and sampled at north scale; this pass reads only
fixed-offset header fields, so it compiles to pure Column expressions
(``substring``/``hex``/``conv`` over the binary column) that run inside
whole-stage codegen on EVERY row — the cheap always-on tier of payload
validation, with fidelity as the expensive sampled tier above it.

Checks emitted (one violation row per failed check, fused-projection shape
like the rows pass):

- ``header-magic`` at ``/bytes``: fmt says png/bmp but the payload does not
  start with that container's signature.
- ``header-dims`` at ``/bytes``: the container header's (w, h) disagrees
  with the declared ``w``/``h`` columns (PNG IHDR big-endian at offset 16;
  BMP BITMAPINFOHEADER little-endian signed at offset 18).
- ``header-len`` at ``/bytes``: fmt=raw but ``length(bytes) != w*h*3``
  (RGB8 contract, FIXTURES.md §1).
- ``header-fmt`` at ``/fmt``: fmt declares an exotic container (jpeg/webp/…)
  but the payload carries a recognizable PNG/BMP signature — a mislabeled
  format column.

Scale shape: one narrow projection over (key, part, fmt, w, h, bytes) — no
shuffle, no UDF, no decode; AQE-irrelevant. At 10^12 rows this is strictly
scan-bound, and column pruning keeps every other column out of the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

PNG_SIG = bytes([0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A])
BMP_SIG = b"BM"

# minimum payload sizes for the header fields we read
_PNG_MIN = 24 + 9          # sig(8) + len(4) + 'IHDR'(4) + w(4) + h(4) + rest
_BMP_MIN = 26              # 'BM' header through the h field


def _be_u32(col: str, pos: int) -> Column:
    """Big-endian uint32 at 1-based byte offset ``pos`` of a binary column."""
    return F.conv(F.hex(F.expr(f"substring({col}, {pos}, 4)")), 16, 10).cast("long")


def _le_i32(col: str, pos: int) -> Column:
    """Little-endian SIGNED int32 at 1-based offset ``pos`` (BMP height may
    legally be negative for top-down rows)."""
    u = F.conv(
        F.concat(*[F.hex(F.expr(f"substring({col}, {pos + k}, 1)")) for k in (3, 2, 1, 0)]),
        16, 10,
    ).cast("long")
    return F.when(u >= F.lit(1 << 31), u - F.lit(1 << 32)).otherwise(u)


def png_header_dims(col: str = "bytes") -> tuple[Column, Column]:
    """(w, h) from the PNG IHDR chunk (always first, spec §5.6): big-endian
    uint32s at byte offsets 16 and 20 (1-based 17 / 21)."""
    return _be_u32(col, 17), _be_u32(col, 21)


def bmp_header_dims(col: str = "bytes") -> tuple[Column, Column]:
    """(w, h) from BITMAPINFOHEADER: little-endian int32 at offsets 18 / 22."""
    return _le_i32(col, 19), _le_i32(col, 23)


def looks_png(col: str = "bytes") -> Column:
    return F.expr(f"substring({col}, 1, 8)") == F.lit(PNG_SIG)


def looks_bmp(col: str = "bytes") -> Column:
    return F.expr(f"substring({col}, 1, 2)") == F.lit(BMP_SIG)


def header_violations(
    fact: DataFrame,
    key_col: str = "image_id",
    part_col: str = "part_id",
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
    w_col: str = "w",
    h_col: str = "h",
    raw_bpp: int = 3,
) -> DataFrame:
    """Emit (part, key, keyword, path, value) violation rows for every
    header/metadata inconsistency. NULL or empty payloads are skipped (the
    rows pass owns null/required semantics); unknown formats are checked
    only by the ``header-fmt`` signature test."""
    fmt = F.col(fmt_col)
    w, h = F.col(w_col).cast("long"), F.col(h_col).cast("long")
    blen = F.length(F.col(bytes_col)).cast("long")
    has_payload = F.col(bytes_col).isNotNull() & (blen > 0)

    png_w, png_h = png_header_dims(bytes_col)
    bmp_w, bmp_h = bmp_header_dims(bytes_col)

    is_png, is_bmp = fmt == "png", fmt == "bmp"
    magic_ok_png = (blen >= _PNG_MIN) & looks_png(bytes_col)
    magic_ok_bmp = (blen >= _BMP_MIN) & looks_bmp(bytes_col)

    v_magic = F.when(
        has_payload & ((is_png & ~magic_ok_png) | (is_bmp & ~magic_ok_bmp)),
        F.format_string("fmt=%s magic=%s", fmt,
                        F.base64(F.expr(f"substring({bytes_col}, 1, 8)"))),
    )
    hdr_w = F.when(is_png, png_w).otherwise(bmp_w)
    hdr_h = F.when(is_png, png_h).otherwise(bmp_h)
    v_dims = F.when(
        has_payload
        & ((is_png & magic_ok_png) | (is_bmp & magic_ok_bmp))
        & ((hdr_w != w) | (F.abs(hdr_h) != h)),
        F.format_string("declared=%sx%s header=%sx%s", w, h, hdr_w, F.abs(hdr_h)),
    )
    v_len = F.when(
        has_payload & (fmt == "raw") & (blen != w * h * F.lit(raw_bpp)),
        F.format_string("len=%s expected=%s", blen, w * h * F.lit(raw_bpp)),
    )
    v_fmt = F.when(
        has_payload & ~fmt.isin("png", "bmp", "raw")
        & ((blen >= _PNG_MIN) & looks_png(bytes_col)
           | (blen >= _BMP_MIN) & looks_bmp(bytes_col)),
        F.format_string(
            "fmt=%s payload=%s", fmt,
            F.when((blen >= _PNG_MIN) & looks_png(bytes_col), F.lit("png"))
             .otherwise(F.lit("bmp"))),
    )

    checks = F.array(
        F.struct(F.lit("header-magic").alias("keyword"),
                 F.lit(f"/{bytes_col}").alias("path"), v_magic.alias("value")),
        F.struct(F.lit("header-dims").alias("keyword"),
                 F.lit(f"/{bytes_col}").alias("path"), v_dims.alias("value")),
        F.struct(F.lit("header-len").alias("keyword"),
                 F.lit(f"/{bytes_col}").alias("path"), v_len.alias("value")),
        F.struct(F.lit("header-fmt").alias("keyword"),
                 F.lit(f"/{fmt_col}").alias("path"), v_fmt.alias("value")),
    )
    return (
        fact.select(
            F.col(part_col).alias("part_id"),
            F.col(key_col).alias("row_key"),
            F.explode(F.filter(checks, lambda c: c["value"].isNotNull())).alias("c"),
        )
        .select("part_id", "row_key", "c.keyword", "c.path", "c.value")
    )


def header_violations_py(row: dict) -> list[tuple[str, str, str]]:
    """Pure-Python reference twin of :func:`header_violations` for one row
    dict with keys (bytes, fmt, w, h) — byte-for-byte identical (keyword,
    path, value) tuples. Backs the driver-gate oracle (the expected set is
    replayed row-by-row without Spark) and the differential pytest."""
    import base64
    import struct

    b, fmt, w, h = row["bytes"], row["fmt"], row["w"], row["h"]
    if not b:
        return []
    out: list[tuple[str, str, str]] = []
    blen = len(b)
    lp = blen >= _PNG_MIN and b[:8] == PNG_SIG
    lb = blen >= _BMP_MIN and b[:2] == BMP_SIG
    if fmt in ("png", "bmp"):
        if not (lp if fmt == "png" else lb):
            out.append(("header-magic", "/bytes",
                        f"fmt={fmt} magic={base64.b64encode(b[:8]).decode()}"))
        else:
            if fmt == "png":
                hw, hh = struct.unpack(">II", b[16:24])
            else:
                hw, hh = struct.unpack("<ii", b[18:26])
            if hw != w or abs(hh) != h:
                out.append(("header-dims", "/bytes",
                            f"declared={w}x{h} header={hw}x{abs(hh)}"))
    elif fmt == "raw":
        if blen != w * h * 3:
            out.append(("header-len", "/bytes", f"len={blen} expected={w * h * 3}"))
    else:
        if lp or lb:
            out.append(("header-fmt", "/fmt",
                        f"fmt={fmt} payload={'png' if lp else 'bmp'}"))
    return out
