"""Reference naming-semantics parity tests (SURVEY.md §5.2 unit tier).

Edge cases pinned from the reference implementation:
enumeration-before-first-dot (download_file.py:94-104), folder
normalization (129-136), explicit-name precedence (107-126).
"""

from s3spark import naming


def test_enumerate_before_first_dot():
    assert naming.enumerate_name("archive.tar.gz", 1) == "archive_1.tar.gz"
    assert naming.enumerate_name("data.csv", 3) == "data_3.csv"


def test_enumerate_no_dot_appends():
    assert naming.enumerate_name("README", 2) == "README_2"


def test_clean_folder_name():
    assert naming.clean_folder_name("/a/b/") == "a/b"
    assert naming.clean_folder_name("a//b///c") == "a/b/c"
    assert naming.clean_folder_name("") == ""
    assert naming.clean_folder_name("///") == ""


def test_combine_folder_and_file_name():
    assert naming.combine_folder_and_file_name("a/b", "c.txt") == "a/b/c.txt"
    assert naming.combine_folder_and_file_name("", "c.txt") == "c.txt"
    assert naming.combine_folder_and_file_name("a//b", "c.txt") == "a/b/c.txt"


def test_destination_file_name_precedence():
    # explicit name wins
    assert (
        naming.destination_file_name(
            source_full_path="x/y/z.txt", dest_file_name="out.txt"
        )
        == "out.txt"
    )
    # explicit + file_number → enumerated
    assert (
        naming.destination_file_name(
            source_full_path="x/y/z.txt", dest_file_name="out.txt", file_number=2
        )
        == "out_2.txt"
    )
    # no explicit name → source basename, file_number ignored
    # (reference: determine_destination_file_name, download_file.py:107-126)
    assert (
        naming.destination_file_name(
            source_full_path="x/y/z.txt", dest_file_name=None, file_number=2
        )
        == "z.txt"
    )


def test_destination_full_path():
    assert (
        naming.destination_full_path("/out//dir/", "f.txt", "a/b.txt")
        == "out/dir/f.txt"
    )
