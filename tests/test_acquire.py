"""Dataset acquisition: create-ref from nothing but a config.

A local mirror tree stands in for the Ensembl/UCSC/NCBI FTP sites
(``download_base_*`` config overrides; zero-egress image).  Covers the
manifest URL construction (``defuse_create_ref.pl:134-237``), resumable
fetching with checksum recording, rmsk conversion and EST splitting
(``:561-629``), and the full chain into ``create_reference``.
"""

import gzip
import http.server
import pathlib
import threading

import pytest

from defuse_tpu.config import Config
from defuse_tpu.pipeline.acquire import (acquire_dataset, build_manifest,
                                         convert_rmsk, fetch,
                                         split_fasta_round_robin)

from synthdata import make_dataset, write_gtf

RMSK_ROW = ("585\t463\t13\t6\t17\tchr1\t10000\t10468\t-249240153\t+\t"
            "(CCCTAA)n\tSimple_repeat\t1\t463\t0\t1")


def _gz(path, data: bytes):
    path.parent.mkdir(parents=True, exist_ok=True)
    with gzip.open(path, "wb") as fh:
        fh.write(data)


@pytest.fixture(scope="module")
def mirror(tmp_path_factory):
    """Local mirror with the exact relative layout the manifest builds."""
    tmp = tmp_path_factory.mktemp("mirror")
    ds = make_dataset(seed=11)
    gtf_text = pathlib.Path(tmp / "_g.gtf")
    write_gtf(ds, gtf_text)

    ens = tmp / "ensembl"
    for c in ("1", "2"):
        fa = (f">{c} dna:chromosome chromosome:TEST1:{c}:1 REF\n"
              f"{ds.genome[c]}\n")
        _gz(ens / "release-69/fasta/homo_sapiens/dna" /
            f"Homo_sapiens.TEST1.69.dna.chromosome.{c}.fa.gz",
            fa.encode())
    _gz(ens / "release-69/gtf/homo_sapiens" /
        "Homo_sapiens.TEST1.69.gtf.gz", gtf_text.read_bytes())

    ucsc = tmp / "ucsc"
    _gz(ucsc / "testg/database/rmsk.txt.gz",
        (RMSK_ROW + "\n#comment line\n" +
         RMSK_ROW.replace("chr1\t10000\t10468", "chrX\t500\t900")
         + "\n").encode())
    est_fa = "".join(f">EST{i}\n{ds.genome['1'][i * 100:i * 100 + 80]}\n"
                     for i in range(7))
    _gz(ucsc / "testg/bigZips/est.fa.gz", est_fa.encode())
    _gz(ucsc / "testg/database/intronEst.txt.gz",
        b"0\tdummy\tintronEst\n")

    ncbi = tmp / "ncbi"
    _gz(ncbi / "Homo_sapiens/Hs.seq.uniq.gz",
        f">UG1\n{ds.genome['2'][1000:1900]}\n".encode())
    return {"root": tmp, "ds": ds}


def _write_config(tmp, mirror_root, dataset_dir):
    cfg = tmp / "config.txt"
    cfg.write_text(f"""
ensembl_version = 69
ensembl_genome_version = TEST1
ucsc_genome_version = testg
chromosomes = 1,2
download_base_ensembl = file://{mirror_root}/ensembl
download_base_ucsc = file://{mirror_root}/ucsc
download_base_ncbi = file://{mirror_root}/ncbi
gene_models = $(dataset_directory)/Homo_sapiens.TEST1.69.gtf
genome_fasta = $(dataset_directory)/genome.fa
chromosome_prefix = $(dataset_directory)/dna.chromosomes
repeats_filename = $(dataset_directory)/repeats.txt
repeats_regions = $(dataset_directory)/repeats.regions
est_fasta = $(dataset_directory)/est.fa
est_alignments = $(dataset_directory)/intronEst.txt
unigene_fasta = $(dataset_directory)/Hs.seq.uniq
est_split_fasta1 = $(dataset_directory)/est.1.fa
est_split_fasta2 = $(dataset_directory)/est.2.fa
est_split_fasta3 = $(dataset_directory)/est.3.fa
prefilter1 = $(unigene_fasta)
gene_biotypes = synth
""")
    return Config.read(str(cfg), str(dataset_dir))


def test_manifest_urls(mirror, tmp_path):
    config = _write_config(tmp_path, mirror["root"], tmp_path / "d")
    entries = {e["name"]: e["url"] for e in build_manifest(config)}
    assert entries["chromosome.1"].endswith(
        "release-69/fasta/homo_sapiens/dna/"
        "Homo_sapiens.TEST1.69.dna.chromosome.1.fa.gz")
    assert entries["gene_models"].endswith(
        "release-69/gtf/homo_sapiens/Homo_sapiens.TEST1.69.gtf.gz")
    assert entries["rmsk"].endswith("testg/database/rmsk.txt.gz")
    assert entries["est_fasta"].endswith("testg/bigZips/est.fa.gz")
    assert entries["intronEst"].endswith("testg/database/intronEst.txt.gz")
    assert entries["unigene"].endswith("Homo_sapiens/Hs.seq.uniq.gz")


def test_acquire_then_create_ref_from_config_only(mirror, tmp_path):
    """The complete chain: config -> downloads -> derivations ->
    create_reference, with nothing pre-staged in the dataset dir."""
    from defuse_tpu.cli.main import main

    dataset = tmp_path / "dataset"
    config = _write_config(tmp_path, mirror["root"], dataset)
    cfg_path = tmp_path / "config.txt"

    rc = main(["create-ref", "-c", str(cfg_path), "-d", str(dataset)])
    assert rc == 0

    # downloads landed, descriptions cleaned, genome concatenated
    genome = (dataset / "genome.fa").read_text()
    assert genome.startswith(">1\n")
    assert ">2\n" in genome and "dna:chromosome" not in genome
    # rmsk converted: chr stripped, start+1, comment dropped
    regions = (dataset / "repeats.regions").read_text().splitlines()
    assert regions[0] == "1\t10001\t10468\tSimple_repeat"
    assert regions[1] == "X\t501\t900\tSimple_repeat"
    assert len(regions) == 2
    # EST round-robin split: 7 records over 3 files -> 3/2/2
    counts = [sum(1 for l in open(dataset / f"est.{i}.fa")
                  if l.startswith(">")) for i in (1, 2, 3)]
    assert counts == [3, 2, 2]
    assert (dataset / f"est.1.fa").read_text().startswith(">EST0\n")
    # unigene prefilter fasta present
    assert (dataset / "Hs.seq.uniq").read_text().startswith(">UG1\n")
    # checksum manifest recorded
    import json
    man = json.loads((dataset / "download.manifest.json").read_text())
    assert {"chromosome.1", "gene_models", "rmsk", "est_fasta",
            "unigene"} <= set(man)
    assert all(len(v["sha256"]) == 64 for v in man.values())
    # create_reference derivations from the downloaded inputs
    assert (dataset / "defuse.cdna.fa").exists()
    assert (dataset / "defuse.reference.fa").exists()

    # re-run: resume-at-file skips downloads (manifest unchanged)
    before = (dataset / "download.manifest.json").read_text()
    assert main(["create-ref", "-c", str(cfg_path),
                 "-d", str(dataset)]) == 0
    assert (dataset / "download.manifest.json").read_text() == before


class _RangeHandler(http.server.SimpleHTTPRequestHandler):
    """Minimal Range-supporting handler (SimpleHTTPRequestHandler
    ignores Range, which would mask resume bugs)."""

    def do_GET(self):
        path = pathlib.Path(self.directory) / self.path.lstrip("/")
        data = path.read_bytes()
        rng = self.headers.get("Range")
        if rng and rng.startswith("bytes="):
            start = int(rng.split("=")[1].split("-")[0])
            self.send_response(206)
            body = data[start:]
        else:
            self.send_response(200)
            body = data
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass


def test_fetch_resumes_partial_download(tmp_path):
    payload = bytes(range(256)) * 64
    (tmp_path / "file.bin").write_bytes(payload)
    handler = lambda *a, **k: _RangeHandler(*a, directory=str(tmp_path),
                                            **k)
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/file.bin"
        dest = tmp_path / "out.bin"
        # simulate an interrupted transfer: half the payload in .part
        (tmp_path / "out.bin.part").write_bytes(payload[:5000])
        info = fetch(url, str(dest))
        assert dest.read_bytes() == payload
        import hashlib
        assert info["sha256"] == hashlib.sha256(payload).hexdigest()
    finally:
        srv.shutdown()


def test_fetch_checksum_mismatch(tmp_path):
    src = tmp_path / "x.txt"
    src.write_bytes(b"hello")
    with pytest.raises(ValueError, match="checksum mismatch"):
        fetch(f"file://{src}", str(tmp_path / "y.txt"),
              expected_sha256="0" * 64)
    assert not (tmp_path / "y.txt").exists()


def test_convert_rmsk_exact(tmp_path):
    rmsk = tmp_path / "rmsk.txt"
    rmsk.write_text(RMSK_ROW + "\n")
    out = tmp_path / "repeats.regions"
    convert_rmsk(str(rmsk), str(out))
    assert out.read_text() == "1\t10001\t10468\tSimple_repeat\n"


def test_split_round_robin(tmp_path):
    fa = tmp_path / "in.fa"
    fa.write_text(">a\nAA\nCC\n>b\nGG\n>c\nTT\n>d\nAC\n")
    outs = [str(tmp_path / f"o{i}.fa") for i in range(3)]
    split_fasta_round_robin(str(fa), outs)
    assert open(outs[0]).read() == ">a\nAACC\n>d\nAC\n"
    assert open(outs[1]).read() == ">b\nGG\n"
    assert open(outs[2]).read() == ">c\nTT\n"
