"""Path/iterator/date helpers vs reference semantics (utils/functions.py,
utils/iterators.py, utils/date_functions.py)."""

import datetime

import pytest

from kryptone_ray.functions import dates, iterators, paths


def test_directory_from_breadcrumbs():
    # functions.py:11-38 doctest
    text = "Bébé fille > T-shirt, polo, sous pull > T-shirt manches longues"
    assert str(paths.directory_from_breadcrumbs(text)) == "bébé_fille/tshirt_polo_sous_pull"


def test_directory_from_url():
    # functions.py:41-62 doctest
    p = "/ma/woman/clothing/dresses/short-dresses/shirt-dress-1.html"
    assert str(paths.directory_from_url(p, exclude=["ma"])) == \
        "woman/clothing/dresses/short_dresses"


def test_create_filename_deterministic():
    a = paths.create_filename(seed_key="item-1")
    assert a == paths.create_filename(seed_key="item-1")
    assert a != paths.create_filename(seed_key="item-2")
    assert paths.create_filename(extension="json", seed_key="x").endswith(".json")
    assert paths.create_filename(suffix="img", seed_key="x").endswith("_img")
    assert "_2024_01_02" in paths.create_filename(seed_key="x", date="2024-01-02")


def test_iterators():
    assert list(iterators.drop_null(["a", None, "", "b"])) == ["a", "b"]
    assert list(iterators.keep_while(lambda x: x > 2, [1, 3, 2, 4])) == [3, 4]
    assert list(iterators.drop_while(lambda x: x > 2, [1, 3, 2, 4])) == [1, 2]
    assert iterators.group_by(lambda x: x % 2 == 0, [1, 2, 3, 4]) == ([2, 4], [1, 3])
    chunks = [list(c) for c in iterators.iterate_chunks([1, 2, 3], 2)]
    assert chunks == [[1, 2], [3]]
    with pytest.raises(ValueError):
        list(iterators.iterate_chunks([1], 0))


def test_dates():
    d1 = datetime.datetime(2024, 1, 1)
    d2 = datetime.datetime(2024, 6, 1)
    # reference quirk: 'expired' = d > now
    assert dates.is_expired(d2, now=d1) is True
    assert dates.is_expired(d1, now=d2) is False
    assert dates.get_day_as_string(d1) == "Monday"
    assert dates.get_monthrange(d1) == (0, 31)
    with pytest.raises(ValueError):
        dates.is_expired("nope", now=d1)
