"""S7 — model download: fetch the trained NER artifact as a zip over HTTP.

The reference bootstraps its server by resolving a public share through a
cloud API that answers ``{"href": <direct link>}``, streaming the zip with
a content-length check, extracting it next to the models directory, and
deleting the archive (server.py:26-48, download_model.py:10-31). This is
that setup step re-expressed on stdlib urllib (no requests/tqdm), split
into pure pieces so everything is testable against a local HTTP server:

    resolve_direct_link(api_url, public_key) -> direct URL
    download(url, dst_path)                  -> False on truncated stream
    fetch_model(model_root, ...)             -> extracted artifact dir

The default endpoint constants mirror the reference's public share; point
``--api-url``/``--public-key`` anywhere that speaks the same one-hop
{"href": ...} protocol. Like the reference, a size mismatch between the
Content-Length header and the received bytes fails the fetch rather than
leaving a torn archive.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import zipfile
from urllib.parse import urlencode
from urllib.request import urlopen

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the reference's public share (server.py:27-28) — public URLs, kept as the
# documented default so a reference user's muscle memory keeps working
DEFAULT_API_URL = "https://cloud-api.yandex.net/v1/disk/public/resources/download?"
DEFAULT_PUBLIC_KEY = "https://yadi.sk/d/7CQPhR2SAu6mxw"
ARCHIVE_NAME = "dp_rubert_from_siamese.zip"
MODEL_SUBDIR = "dp_rubert_from_siamese"
BLOCK_SIZE = 1024


def resolve_direct_link(api_url: str, public_key: str) -> str:
    """One API hop: GET api_url?public_key=... → JSON with ``href``."""
    with urlopen(api_url + urlencode({"public_key": public_key})) as resp:
        payload = json.loads(resp.read())
    href = payload.get("href")
    if not href:
        raise ValueError(f"no 'href' in the API response: {payload!r}")
    return href


def download(url: str, dst_path: str) -> bool:
    """Stream ``url`` to ``dst_path`` in BLOCK_SIZE chunks; False when the
    byte count disagrees with a non-zero Content-Length (the reference's
    truncation check, server.py:43-44)."""
    with urlopen(url) as resp:
        total = int(resp.headers.get("content-length", 0) or 0)
        received = 0
        with open(dst_path, "wb") as f:
            while True:
                chunk = resp.read(BLOCK_SIZE)
                if not chunk:
                    break
                received += len(chunk)
                f.write(chunk)
    return not (total != 0 and received != total)


def fetch_model(
    model_root: str,
    api_url: str = DEFAULT_API_URL,
    public_key: str = DEFAULT_PUBLIC_KEY,
    direct_url: str | None = None,
) -> str:
    """Resolve → download → verify size → extract → delete archive.
    Returns the extracted artifact directory; raises on a truncated
    download or an extraction that yields no ``ner.json``."""
    os.makedirs(model_root, exist_ok=True)
    url = direct_url or resolve_direct_link(api_url, public_key)
    archive = os.path.join(model_root, ARCHIVE_NAME)
    if not download(url, archive):
        os.remove(archive)
        raise ValueError("The NER cannot be downloaded: truncated stream!")
    with zipfile.ZipFile(archive) as zf:
        zf.extractall(model_root)
    os.remove(archive)
    target = os.path.join(model_root, MODEL_SUBDIR)
    found = target if os.path.isdir(target) else model_root
    if not os.path.isfile(os.path.join(found, "ner.json")):
        raise ValueError(
            f"archive extracted to {found!r} but contains no ner.json —"
            " not a NER artifact"
        )
    return found


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("model_root", help="directory to download/extract into")
    ap.add_argument("--api-url", default=DEFAULT_API_URL)
    ap.add_argument("--public-key", default=DEFAULT_PUBLIC_KEY)
    ap.add_argument(
        "--direct-url",
        default=None,
        help="skip the API hop and fetch this URL directly",
    )
    args = ap.parse_args()
    path = fetch_model(
        args.model_root,
        api_url=args.api_url,
        public_key=args.public_key,
        direct_url=args.direct_url,
    )
    print(f"extracted model at {path}")


if __name__ == "__main__":
    main()
