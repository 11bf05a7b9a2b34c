"""Center-manifest (data_xlsx) reader tests.

Hermetic part: builds a minimal OOXML workbook with stdlib zipfile and
asserts the parse + schema normalization. Reference-gated part: parses the
five shipped manifests and proves they reconstruct the ``infos/*.npy``
index field-for-field (the manifests are the index's upstream source —
each infos record's ``fold`` is a manifest file stem).
"""

import zipfile
from pathlib import Path

import numpy as np
import pytest

from glfusion_tpu.data.xlsx import (
    ALL_POSITIONS,
    cross_check_infos,
    load_center_manifest,
    load_manifest_dir,
    parse_positions,
    read_sheet,
)

REFERENCE_XLSX = Path("/root/reference/GLfusion/data_xlsx")
REFERENCE_INFOS = Path("/root/reference/GLfusion/infos/save_infos_reg_v2.npy")

_SHEET_TMPL = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<sheetData>{rows}</sheetData></worksheet>"""

_SHARED_TMPL = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
{items}</sst>"""


def _write_workbook(path, header, rows):
    """Minimal .xlsx: strings go through sharedStrings, numbers inline."""
    strings = []

    def cell(ref, value):
        if value is None:
            return ""
        try:
            float(value)
            return f'<c r="{ref}"><v>{value}</v></c>'
        except (TypeError, ValueError):
            strings.append(str(value))
            return f'<c r="{ref}" t="s"><v>{len(strings) - 1}</v></c>'

    xml_rows = []
    for i, row in enumerate([header] + rows, start=1):
        cells = "".join(
            cell(f"{chr(ord('A') + j)}{i}", v) for j, v in enumerate(row)
        )
        xml_rows.append(f'<row r="{i}">{cells}</row>')
    items = "".join(f"<si><t>{s}</t></si>" for s in strings)
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("xl/worksheets/sheet1.xml",
                   _SHEET_TMPL.format(rows="".join(xml_rows)))
        z.writestr("xl/sharedStrings.xml", _SHARED_TMPL.format(items=items))
    return path


def test_parse_positions_marker_forms():
    assert parse_positions(None) == ALL_POSITIONS
    assert parse_positions("√") == ALL_POSITIONS
    assert parse_positions("缺3") == ("1", "2", "4", "5", "6", "7")
    assert parse_positions("缺5/7") == ("1", "2", "3", "4", "6")
    assert parse_positions("缺3、5/7") == ("1", "2", "4", "6")
    assert parse_positions("仅4、6") == ("4", "6")
    assert parse_positions("仅1/2/4") == ("1", "2", "4")
    assert parse_positions("2/4/6/7") == ("2", "4", "6", "7")
    with pytest.raises(ValueError):
        parse_positions("nonsense")


def test_read_sheet_and_manifest_roundtrip(tmp_path):
    path = _write_workbook(
        tmp_path / "dataset_pa_nii_fake_center_size_3.xlsx",
        ["name", "number", "mPAP", "Vmax", "Ps"],
        [
            ["张三", "P1", 30, 4.45, "缺3"],
            ["李四", "P2", 36, None, "仅4、6"],
            ["王五", "P3", None, 2.5, "√"],
            [None, None, 99, 9.9, "√"],  # trailing note row: no number
        ],
    )
    rows = read_sheet(path)
    assert rows[0]["A"] == "name" and rows[1]["B"] == "P1"

    manifest = load_center_manifest(path)
    assert set(manifest) == {"P1", "P2", "P3"}
    assert manifest["P1"].mPAP == 30.0
    assert manifest["P1"].positions == ("1", "2", "4", "5", "6", "7")
    assert manifest["P2"].Vmax is None
    assert manifest["P2"].positions == ("4", "6")
    assert manifest["P3"].mPAP is None
    # privacy: the name column is dropped, not stored anywhere
    assert all("name" not in vars(r) for r in manifest.values())


def test_non_p_numbers_kept_verbatim(tmp_path):
    """All five shipped manifests number rows 'P1','P2',...; an unexpected
    digit-only number must pass through VERBATIM — silently renumbering
    (e.g. a +1 shift) would swap every patient's clinical values."""
    path = _write_workbook(
        tmp_path / "digits.xlsx",
        ["number", "mPAP", "Vmax", "Ps"],
        [[0, 30, 4.45, "缺3"], [1, 36, 4.11, "仅4、6"]],
    )
    manifest = load_center_manifest(path)
    assert set(manifest) == {"0", "1"}
    assert manifest["0"].mPAP == 30.0


@pytest.mark.skipif(not REFERENCE_XLSX.is_dir() or not REFERENCE_INFOS.exists(),
                    reason="reference repo not mounted")
def test_reference_manifests_reconstruct_infos_index():
    """The five shipped manifests agree with infos on EVERY record that
    carries a (fold, number) pair — 119 of 333 in save_infos_reg_v2.npy
    (the rest predate the manifest folds and carry number=None)."""
    manifests = load_manifest_dir(REFERENCE_XLSX)
    assert len(manifests) == 5
    assert sum(len(m) for m in manifests.values()) == 281
    infos = np.load(REFERENCE_INFOS, allow_pickle=True).item()
    stats = cross_check_infos(manifests, infos)
    assert stats["missing_row"] == 0
    assert stats["checked"] >= 100
    assert stats["matched"] == stats["checked"]
