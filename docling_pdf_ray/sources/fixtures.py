"""Deterministic synthetic `pages` fixture generation (FIXTURES.md §1).

Seeded ``random.Random`` only — same seed ⇒ same bytes at every scale
prefix. Every row class from FIXTURES.md is present at every scale:

    html_clean html_linkfarm html_empty pdf_ok pdf_big pdf_baddims
    pdf_baddims_unterminated pdf_badpage pdf_corrupt_text
    pdf_corrupt_binary not_pdf too_large dup_url

(`pdf_baddims_unterminated` exercises the dimension-arm → backend
cascade; `pdf_badpage` the fallback hard-fail sentinel;
`pdf_corrupt_binary` the fix-stage open failure → failure record;
`pdf_corrupt_text` the corrupt → fallback-with-empty-text path.)
"""

from __future__ import annotations

import datetime as dt
import random

import pyarrow as pa
import pyarrow.parquet as pq

from ..payload import build
from ..schema import PAGES_SCHEMA

EPOCH = dt.datetime(2024, 1, 1)

# the lowered payload-size cap tests/benches use so the `too_large`
# class trips it without multi-MB fixture bytes
TEST_MAX_BYTES = 1024 * 1024
LANGS = ["en", "fr", "es", "zh", "de"]

WORDS = ("data ray arrow stream batch shuffle actor block parquet column "
         "crawl page text table image span url partition lineage schema "
         "extract content heading main nav dense sparse corpus token").split()

CLASS_WEIGHTS = [
    ("html_clean", 30), ("html_linkfarm", 8), ("html_empty", 3),
    ("pdf_ok", 25), ("pdf_big", 4), ("pdf_baddims", 5),
    ("pdf_baddims_unterminated", 3), ("pdf_badpage", 3),
    ("pdf_corrupt_text", 4), ("pdf_corrupt_binary", 3),
    ("not_pdf", 5), ("too_large", 3), ("dup_url", 4),
]


def _sentence(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(n))


def _html_clean(rng: random.Random) -> bytes:
    paras = "\n".join(
        f"<p>{_sentence(rng, rng.randint(15, 60))}.</p>"
        for _ in range(rng.randint(3, 12)))
    nav = "".join(f'<a href="/x{i}">{rng.choice(WORDS)}</a> ' for i in range(8))
    imgs = '<img src="hero.png" alt="hero image">' if rng.random() < 0.3 else ""
    table = (f"<table><tr><td>{_sentence(rng, 8)}</td>"
             f"<td>{_sentence(rng, 8)}</td></tr></table>"
             if rng.random() < 0.3 else "")
    return (f"<!DOCTYPE html><html><head><title>t</title>"
            f"<style>.x{{color:red}}</style></head><body>"
            f"<nav>{nav}</nav><header><h1>site</h1></header>"
            f"<article><h1>{_sentence(rng, 5)}</h1>{imgs}{paras}{table}</article>"
            f"<footer><p>copyright {nav}</p></footer></body></html>").encode()


def _html_linkfarm(rng: random.Random) -> bytes:
    links = "\n".join(
        f'<li><a href="/l{i}">{_sentence(rng, 4)}</a></li>'
        for i in range(rng.randint(20, 60)))
    body = f"<p>{_sentence(rng, rng.randint(25, 50))}.</p>" if rng.random() < 0.5 else ""
    return (f"<html><body><div><ul>{links}</ul>{body}</div></body></html>").encode()


def _pdf_pages(rng: random.Random, n_pages: int, w=612.0, h=792.0,
               tables=True) -> list:
    pages = []
    for _ in range(n_pages):
        lines = []
        if rng.random() < 0.4:
            lines.append(f"# {_sentence(rng, 4)}")
        for _ in range(rng.randint(5, 40)):
            lines.append(_sentence(rng, rng.randint(6, 14)) + ".")
        if tables and rng.random() < 0.25:
            lines.append("%%TABLE " + " | ".join(rng.choice(WORDS) for _ in range(4)))
        if rng.random() < 0.2:
            lines.append("%%IMAGE figure " + rng.choice(WORDS))
        pages.append((w, h, lines))
    return pages


def make_payload(cls: str, rng: random.Random) -> bytes:
    if cls in ("html_clean", "dup_url"):
        return _html_clean(rng)
    if cls == "html_linkfarm":
        return _html_linkfarm(rng)
    if cls == "html_empty":
        return b"<html><body>   </body></html>"
    if cls == "pdf_ok":
        return build(_pdf_pages(rng, rng.randint(1, 6)),
                     meta={"producer": rng.choice(["FPDF", "SynthWriter"])})
    if cls == "pdf_big":
        return build(_pdf_pages(rng, rng.randint(100, 250)))
    if cls == "pdf_baddims":
        pages = _pdf_pages(rng, rng.randint(2, 5))
        bad = [(0.0, 0.0, pages[0][2])] + pages[1:]
        return build(bad)
    if cls == "pdf_baddims_unterminated":
        pages = _pdf_pages(rng, rng.randint(2, 4))
        bad = [(0.0, -1.0, pages[0][2])] + pages[1:]
        return build(bad, terminated=False)
    if cls == "pdf_badpage":
        good = build(_pdf_pages(rng, 2)).decode()
        lines = good.split("\n")
        lines.insert(3, "%%PAGE not numeric")
        return "\n".join(lines).encode()
    if cls == "pdf_corrupt_text":
        return b"%PDF-1.4\n" + _sentence(rng, 30).encode() + b"\nno structure here\n"
    if cls == "pdf_corrupt_binary":
        return b"%PDF-1.4\n" + bytes(rng.getrandbits(8) for _ in range(64)) + b"\xff\xfe\x80"
    if cls == "not_pdf":
        return _sentence(rng, 20).encode()
    if cls == "too_large":
        # oversized relative to the LOWERED test cap (TEST_MAX_BYTES);
        # content is a valid pdf otherwise
        line = _sentence(rng, 10)
        n = TEST_MAX_BYTES // len(line) + 1000
        return build([(612.0, 792.0, [line] * n)])
    raise ValueError(cls)


def generate_pages_table(n_rows: int, seed: int = 7) -> pa.Table:
    """Deterministic `pages` table; row i's class is drawn by seeded
    weighted choice; dup_url rows repeat an earlier url with a later
    warc_ts and a (different) payload."""
    rng = random.Random(seed)
    classes = [c for c, w in CLASS_WEIGHTS for _ in range(w)]
    urls, tss, payloads, texts, langs, row_cls = [], [], [], [], [], []
    for i in range(n_rows):
        cls = rng.choice(classes)
        if cls == "dup_url" and i > 10:
            target = rng.randrange(0, i)
            url = urls[target]
            ts = EPOCH + dt.timedelta(seconds=i * 61 + 1)
        else:
            cls = "html_clean" if cls == "dup_url" else cls
            url = f"https://example.org/{cls}/{i}"
            ts = EPOCH + dt.timedelta(seconds=i * 61)
        payload = make_payload(cls, rng)
        urls.append(url)
        tss.append(ts)
        payloads.append(payload)
        texts.append(_sentence(rng, 12) if rng.random() < 0.7 else None)
        langs.append(rng.choice(LANGS))
        row_cls.append(cls)
    t = pa.Table.from_arrays([
        pa.array(urls, pa.string()),
        pa.array(tss, pa.timestamp("us")),
        pa.array(payloads, pa.binary()),
        pa.array(texts, pa.string()),
        pa.array(langs, pa.string()),
    ], schema=PAGES_SCHEMA)
    return t.append_column("row_class", pa.array(row_cls, pa.string()))


def write_pages_fixture(out_dir: str, n_rows: int = 200, seed: int = 7,
                        n_files: int = 4, with_class: bool = False) -> list[str]:
    """Write the fixture as n_files parquet shards (≥2 so resume and
    scaling tests are meaningful). Returns the file paths."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    t = generate_pages_table(n_rows, seed)
    if not with_class:
        t = t.drop_columns(["row_class"])
    paths = []
    per = (t.num_rows + n_files - 1) // n_files
    for k in range(n_files):
        chunk = t.slice(k * per, per)
        if chunk.num_rows == 0:
            break
        path = os.path.join(out_dir, f"pages-{k:05d}.parquet")
        pq.write_table(chunk, path)
        paths.append(path)
    return paths
