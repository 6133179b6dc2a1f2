"""The shipped species asset packs resolve and parse.

Reference: amira/assets/<species>/ + pre_processing.py:100-123. The three
data tables (AMR_calls.json, core_genes.txt, plasmid_genes.txt) ship with
this package; only the allele FASTA is external, so `--species X
--amr-fasta F` must need no other override flags.
"""

import json
import os

import pytest

from amira_tpu.preprocess import load_species_specific_files

SPECIES = [
    "Escherichia_coli",
    "Klebsiella_pneumoniae",
    "Enterococcus_faecium",
    "Staphylococcus_aureus",
    "Streptococcus_pneumoniae",
    "ESKAPEES",
]

ASSETS = os.path.join(os.path.dirname(__file__), "..", "amira_tpu", "assets")


@pytest.mark.parametrize("species", SPECIES)
def test_pack_ships_data_tables(species):
    d = os.path.join(ASSETS, species)
    with open(os.path.join(d, "AMR_calls.json")) as fh:
        calls = json.load(fh)
    assert isinstance(calls, dict) and len(calls) > 100
    with open(os.path.join(d, "core_genes.txt")) as fh:
        core = fh.read()
    with open(os.path.join(d, "plasmid_genes.txt")) as fh:
        plasmid = [x for x in fh.read().split("\n") if x]
    assert len(plasmid) > 10
    # ESKAPEES intentionally has no core genes (reference ships it empty)
    if species != "ESKAPEES":
        assert len([x for x in core.split("\n") if x]) > 100


def test_resolver_fills_missing_files_from_pack(tmp_path):
    fasta = tmp_path / "alleles.fa"
    fasta.write_text(">geneA;allele1\nACGT\n")
    amr_fasta, calls, core, plasmid = load_species_specific_files(
        "Escherichia_coli", str(fasta), None, None, None
    )
    assert amr_fasta == str(fasta)
    for path in (calls, core, plasmid):
        assert os.path.exists(path), path
    assert calls.endswith("AMR_calls.json")
    assert core.endswith("core_genes.txt")
    assert plasmid.endswith("plasmid_genes.txt")


def test_resolver_rejects_unknown_species():
    with pytest.raises(SystemExit):
        load_species_specific_files("Not_a_species", None, None, None, None)
