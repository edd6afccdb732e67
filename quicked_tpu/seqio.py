"""Sequence-pair I/O: the `.seq` 2-line format and output writers.

Format semantics from align_benchmark_read_input (align_benchmark.c:73-99):
pattern lines start with '>', text lines with '<'; the leading char is
stripped. The benchmark TSV output formats follow quicked_print_output
(benchmark_utils.c:151-188).
"""

from __future__ import annotations

from typing import Iterator, TextIO


def read_seq_batches(path: str, batch_size: int,
                     chunk_bytes: int = 32 << 20) -> Iterator[list]:
    """Stream a .seq file as batches of (pattern, text) pairs.

    Uses the native C parser (sequence_buffer semantics,
    native/src/quicked_host.c:qh_read_seq_batch) on large reads when
    available — the Python line reader is the fallback. This is the
    production input path for multi-million-pair streams.
    """
    from quicked_tpu import native

    if not native.available():
        batch = []
        for pair in read_seq_pairs(path):
            batch.append(pair)
            if len(batch) >= batch_size:
                yield batch
                batch = []
        if batch:
            yield batch
        return

    with open(path, "rb") as f:
        tail = b""
        batch: list = []
        while True:
            chunk = f.read(chunk_bytes)
            data = tail + chunk
            if not data:
                break
            eof = not chunk
            pos = 0
            while True:
                pairs, consumed = native.read_seq_batch(
                    data[pos:], batch_size - len(batch))
                batch.extend(pairs)
                pos += consumed
                if len(batch) >= batch_size:
                    yield batch
                    batch = []
                if consumed == 0 or pos >= len(data):
                    break
            tail = data[pos:]
            if eof:
                break
        # trailing record without final newline
        if tail.strip():
            txt = tail.decode("ascii", "replace")
            lines = txt.splitlines()
            for i in range(0, len(lines) - 1, 2):
                batch.append((lines[i][1:], lines[i + 1][1:]))
        if batch:
            yield batch


def read_seq_pairs(path_or_file) -> Iterator[tuple[str, str]]:
    """Yield (pattern, text) pairs from a .seq file."""
    close = False
    if isinstance(path_or_file, str):
        f: TextIO = open(path_or_file, "r")
        close = True
    else:
        f = path_or_file
    try:
        while True:
            line1 = f.readline()
            if not line1:
                break
            line2 = f.readline()
            if not line2:
                break
            yield line1[1:].rstrip("\n"), line2[1:].rstrip("\n")
    finally:
        if close:
            f.close()


def write_seq_pairs(path_or_file, pairs) -> None:
    """Write (pattern, text) pairs in the `>pattern\\n<text\\n` format."""
    close = False
    if isinstance(path_or_file, str):
        f: TextIO = open(path_or_file, "w")
        close = True
    else:
        f = path_or_file
    try:
        for pattern, text in pairs:
            f.write(f">{pattern}\n<{text}\n")
    finally:
        if close:
            f.close()


def format_output_lite(score, cigar: str | None) -> str:
    """`score\\tCIGAR` line (benchmark_utils.c:167)."""
    return f"{score}\t{cigar if cigar is not None else '-'}"


def format_output_full(pattern: str, text: str, score, cigar: str | None) -> str:
    """6-column output (benchmark_utils.c:159-165)."""
    c = cigar if cigar is not None else "-"
    return f"{len(pattern)}\t{len(text)}\t{score}\t{pattern}\t{text}\t{c}"
