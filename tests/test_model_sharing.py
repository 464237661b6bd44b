"""Model zip export/install and URL download (ref distillation/nnunetv2/
model_sharing/{model_export,model_import,model_download,entry_points}.py).
The download test serves the zip from a local HTTP server (no egress)."""
import os
import threading
import zipfile
from functools import partial
from http.server import HTTPServer, SimpleHTTPRequestHandler

import numpy as np

from fast_nnunet_tpu.utils.model_sharing import (
    download_and_install_from_url, install_model_from_zip_file)


def _make_model_zip(path, tmpdir):
    tree = os.path.join(tmpdir, "Dataset999_X", "NNUNetTrainer__nnUNetPlans__3d_fullres")
    os.makedirs(os.path.join(tree, "fold_0"))
    for f in ("plans.json", "dataset.json"):
        with open(os.path.join(tree, f), "w") as fh:
            fh.write("{}")
    with open(os.path.join(tree, "fold_0", "checkpoint_final.fnnx"), "wb") as fh:
        fh.write(b"\x00" * 64)
    with zipfile.ZipFile(path, "w") as zf:
        for root, _, files in os.walk(os.path.join(tmpdir, "Dataset999_X")):
            for f in files:
                p = os.path.join(root, f)
                zf.write(p, os.path.relpath(p, tmpdir))


def test_install_from_zip(tmp_path, monkeypatch):
    src = str(tmp_path / "src")
    os.makedirs(src)
    zip_path = str(tmp_path / "model.zip")
    _make_model_zip(zip_path, src)
    results = str(tmp_path / "results")
    os.makedirs(results)
    monkeypatch.setenv("nnUNet_results", results)
    install_model_from_zip_file(zip_path)
    assert os.path.isfile(os.path.join(
        results, "Dataset999_X", "NNUNetTrainer__nnUNetPlans__3d_fullres",
        "fold_0", "checkpoint_final.fnnx"))


def test_download_and_install_from_url(tmp_path, monkeypatch):
    src = str(tmp_path / "srv")
    os.makedirs(src)
    _make_model_zip(os.path.join(src, "model.zip"), src)
    handler = partial(SimpleHTTPRequestHandler, directory=src)
    httpd = HTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        results = str(tmp_path / "results")
        os.makedirs(results)
        monkeypatch.setenv("nnUNet_results", results)
        url = f"http://127.0.0.1:{httpd.server_address[1]}/model.zip"
        download_and_install_from_url(url)
        assert os.path.isfile(os.path.join(
            results, "Dataset999_X", "NNUNetTrainer__nnUNetPlans__3d_fullres",
            "fold_0", "checkpoint_final.fnnx"))
    finally:
        httpd.shutdown()
