"""NIfTI export CLI: dump HDF5/zarr volume groups to per-key .nii.gz files.

Flag-surface parity with the reference click command
(`/root/reference/midasmednet/utils/export.py:15-89`): channel-subset
selection (``heatmaps`` = all-but-last, ``mask`` = last channel),
sum-channels mode, float/int dtype, optional key file, with the stored
``affine`` attribute carried into each NIfTI.  Uses the self-contained
NIfTI writer (nibabel is not available in this image).
"""

from __future__ import annotations

from pathlib import Path

import click
import numpy as np

from tpu_mednet.config import load_dotenv
from tpu_mednet.utils.nifti import save_nifti


@click.command()
@click.option("--data_path", required=True)
@click.option("--data_group", default="images")
@click.option("--export_dir", required=True)
@click.option("--sum_channels", default=False, is_flag=True)
@click.option("--test_keys", default=None)
@click.option("--select_channels", default="all",
              type=click.Choice(["heatmaps", "mask", "all"], case_sensitive=False))
@click.option("--dtype", default="float",
              type=click.Choice(["float", "int"], case_sensitive=False))
def export_to_nii(data_path, data_group, export_dir, sum_channels,
                  test_keys, select_channels, dtype):
    load_dotenv()
    data_path = Path(data_path)
    export_dir = Path(export_dir)
    out_dir = export_dir / data_path.stem / data_group
    out_dir.mkdir(exist_ok=True, parents=True)
    _dtype = np.float32 if dtype == "float" else np.uint8

    if data_path.suffix not in (".h5", ".hdf5", ".zip", ".zarr"):
        raise click.BadParameter(f"unsupported storage suffix {data_path.suffix}")
    if data_path.suffix in (".h5", ".hdf5"):
        import h5py

        hf = h5py.File(data_path, "r")
        closer = hf.close
    else:
        try:
            import zarr
        except ImportError:  # bundled v2 fallback
            from tpu_mednet.data import zarrlite as zarr

        if data_path.suffix == ".zarr":
            hf = zarr.open(str(data_path), mode="r")
        else:
            store = zarr.ZipStore(str(data_path), mode="r")
            hf = zarr.open(store=store, mode="r")
        # close the backing store (a ZipStore holds the zip file open)
        _store = getattr(hf, "store", None)
        closer = (_store.close if _store is not None
                  and hasattr(_store, "close") else lambda: None)

    try:
        if test_keys:
            with open(test_keys) as f:
                keys = [line.strip() for line in f if line.strip()]
        else:
            keys = list(hf[data_group])

        for key in keys:
            ds = hf[f"{data_group}/{key}"]
            affine = np.asarray(ds.attrs["affine"])
            if sum_channels:
                if select_channels == "all":
                    img = ds[:]
                elif select_channels == "heatmaps":
                    img = ds[:-1]
                else:  # mask
                    img = ds[-1:]
                img = np.asarray(img, dtype=_dtype).sum(axis=0)
                save_nifti(
                    out_dir / f"{key}_{data_group}_{select_channels}_sum.nii.gz",
                    img, affine,
                )
            else:
                for c in range(ds.shape[0]):
                    img = np.asarray(ds[c, ...], dtype=_dtype)
                    save_nifti(out_dir / f"{key}_{data_group}_c{c}.nii.gz",
                               img, affine)
        click.echo(f"exported {len(keys)} keys to {out_dir}")
    finally:
        closer()


def main():
    export_to_nii()


if __name__ == "__main__":
    main()
