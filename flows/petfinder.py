"""Shim for the reference's Prefect petfinder flow (flows/petfinder.py).

The Prefect server/Dask runtime is replaced by the plain CLI in
cyclegan_tpu.apps.flows; ``main`` runs the download flow directly.
"""

from cyclegan_tpu.apps.flows import (  # noqa: F401
    download_flow,
    download_photos,
    get_photo_urls,
)


def main():
    import argparse
    from pathlib import Path

    parser = argparse.ArgumentParser("petfinder downloader")
    parser.add_argument("--breeds", nargs="+",
                        default=["Tabby", "Tortoiseshell"])
    parser.add_argument("--destination", type=Path, default=Path("data/raw"))
    parser.add_argument("--pages", type=int, default=10)
    args = parser.parse_args()
    download_flow(args.breeds, args.destination, args.pages)


if __name__ == "__main__":
    main()
