"""xxh3-128 change-detection hashing (ref storage/mod.rs:72-94)."""

from sema_tpu.ingest.hashing import hash_bytes, hash_file


def test_known_answer_empty():
    # xxh3-128 of empty input — pins the algorithm choice.
    assert hash_bytes(b"") == format(0x99AA06D3014798D86001C324468D497F, "x")


def test_hex_format_is_unpadded_lowercase():
    # Rust format!("{:x}", u128) does not zero-pad (storage/mod.rs:78).
    h = hash_bytes(b"")
    assert h == h.lower()
    assert not h.startswith("0")  # this digest has no leading zero nibble


def test_streamed_equals_whole(tmp_path):
    big = tmp_path / "big.bin"
    data = bytes(range(256)) * 8192  # 2 MiB > streaming threshold
    big.write_bytes(data)
    assert hash_file(big) == hash_bytes(data)


def test_small_file(tmp_path):
    f = tmp_path / "small.txt"
    f.write_bytes(b"hello")
    assert hash_file(f) == hash_bytes(b"hello")


def test_change_detection():
    assert hash_bytes(b"a") != hash_bytes(b"b")
