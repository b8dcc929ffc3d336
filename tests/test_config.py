"""Config system tests (mirrors ref go/config/config_test.go: converter
units, parser-stage units, invalid-fixture diagnostics, flag parsing)."""

import pytest

from minnow_tpu.utils.config import (ConfigError, ConfigVars, read_config,
                                     read_flags)


def _cat_vars():
    v = ConfigVars("cat_info")
    v.string("CatName", "")
    v.strings("FurColors", [])
    v.float("Age", -1)
    v.int("Paws", 4)
    v.int("Tail", 1)
    v.bool("Cute", False)
    v.floats("Weights", [])
    v.bools("Moods", [])
    return v


def test_read_config_basic(tmp_path):
    p = tmp_path / "cat.config"
    p.write_text("""# Title
[cat_info]

# Body:
CatName = Bob
FurColors = White, Black
Age = 7.5 # Inline comments are okay, too.
Paws = 4
Cute = true
Weights = 1.5, 2.5
Moods = true, false
""")
    v = _cat_vars()
    read_config(str(p), v)
    assert v["CatName"] == "Bob"
    assert v["FurColors"] == ["White", "Black"]
    assert v["Age"] == 7.5
    assert v["Paws"] == 4
    assert v["Tail"] == 1  # default preserved
    assert v["Cute"] is True
    assert v["Weights"] == [1.5, 2.5]
    assert v["Moods"] == [True, False]


def test_read_config_case_insensitive(tmp_path):
    p = tmp_path / "c.config"
    p.write_text("[cat_info]\ncatname = Whiskers\n")
    v = _cat_vars()
    read_config(str(p), v)
    assert v["CatName"] == "Whiskers"


def test_missing_title(tmp_path):
    p = tmp_path / "c.config"
    p.write_text("CatName = Bob\n")
    with pytest.raises(ConfigError, match=r"header \[cat_info\]"):
        read_config(str(p), _cat_vars())


def test_wrong_title(tmp_path):
    p = tmp_path / "c.config"
    p.write_text("[dog_info]\n")
    with pytest.raises(ConfigError, match=r"header \[cat_info\]"):
        read_config(str(p), _cat_vars())


def test_not_an_assignment_reports_line(tmp_path):
    p = tmp_path / "c.config"
    p.write_text("[cat_info]\nCatName = Bob\nthis is not assignment\n")
    with pytest.raises(ConfigError, match="line 3"):
        read_config(str(p), _cat_vars())


def test_unknown_variable_reports_line(tmp_path):
    p = tmp_path / "c.config"
    p.write_text("[cat_info]\n\nWhiskerLength = 3\n")
    with pytest.raises(ConfigError,
                       match="Line 3 .* 'WhiskerLength'"):
        read_config(str(p), _cat_vars())


def test_duplicate_reports_both_lines(tmp_path):
    p = tmp_path / "c.config"
    p.write_text("[cat_info]\nAge = 1\nPaws = 4\nage = 2\n")
    with pytest.raises(ConfigError, match="Lines 2 and 4"):
        read_config(str(p), _cat_vars())


def test_conversion_error_reports_type(tmp_path):
    p = tmp_path / "c.config"
    p.write_text("[cat_info]\nAge = fluffy\n")
    with pytest.raises(ConfigError, match="expects values of type float"):
        read_config(str(p), _cat_vars())


def test_int_conversion_error(tmp_path):
    p = tmp_path / "c.config"
    p.write_text("[cat_info]\nPaws = 4.5\n")
    with pytest.raises(ConfigError, match="an int"):
        read_config(str(p), _cat_vars())


def test_read_flags():
    v = _cat_vars()
    read_flags(["--CatName", "Bob", "--Age", "7.5",
                "--FurColors", "White", "Black"], v)
    assert v["CatName"] == "Bob"
    assert v["Age"] == 7.5
    assert v["FurColors"] == ["White", "Black"]


def test_read_flags_errors():
    with pytest.raises(ConfigError, match="equals sign"):
        read_flags(["--Age=7"], _cat_vars())
    with pytest.raises(ConfigError, match="does not have a flag"):
        read_flags(["7"], _cat_vars())
    with pytest.raises(ConfigError, match="wasn't set to a value"):
        read_flags(["--Age"], _cat_vars())
    with pytest.raises(ConfigError, match="cannot be set"):
        read_flags(["--Nope", "1"], _cat_vars())
    with pytest.raises(ConfigError, match="assigned twice"):
        read_flags(["--Age", "1", "--age", "2"], _cat_vars())
    with pytest.raises(ConfigError, match="could not parse the flag"):
        read_flags(["--Paws", "x"], _cat_vars())


def test_name_index(tmp_path):
    from minnow_tpu.utils.name_index import open_index

    p = tmp_path / "names.txt"
    p.write_text("""mvir Mvir M200 mass
x X posx
id ID haloid
""")
    idx = open_index(str(p))
    assert idx.all_names == ["mvir", "x", "id"]
    assert idx.standardize("M200") == ("mvir", True)
    assert idx.standardize("POSX") == ("x", True)
    assert idx.standardize("mvir") == ("mvir", True)
    assert idx.standardize("unknown") == ("unknown", False)
