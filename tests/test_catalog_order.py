"""Guard: the driver checks only the first 50 registered queries.

Every SURVEY §2 / LLM-component coverage row must have its verifying query
inside that window, one query per row, so a catalog edit can't silently
strand an operator beyond the driver's reach.
"""

import milan_spark.catalog as cat


def test_driver_window_is_first_50():
    names = list(cat.queries())
    assert len(cat.DRIVER_WINDOW) == 50
    assert names[:50] == list(cat.DRIVER_WINDOW)


def test_driver_window_names_all_registered():
    names = set(cat.queries())
    missing = [n for n in cat.DRIVER_WINDOW if n not in names]
    assert not missing, f"DRIVER_WINDOW references unregistered queries: {missing}"
