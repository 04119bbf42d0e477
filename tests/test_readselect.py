"""
Behavioral tests of the read-selection algorithm (coverage downsampling),
mirroring the reference's tests/test_readselect.py expectations — the
selected index sets are part of the compatibility contract (reference:
whatshap/readselect.pyx).
"""

from whatshap_tpu.readselect import readselection
from whatshap_tpu.testhelpers import string_to_readset


def test_selection():
    reads = string_to_readset(
        """
      1  1
      00
      0   1
      10  1
      1   1
        11
      0   1
      1    1
    """
    )
    assert readselection(reads, max_cov=1, preferred_source_ids=None, bridging=False) == {1, 5}
    assert readselection(reads, max_cov=2, preferred_source_ids=None, bridging=False) == {1, 3, 5}
    assert readselection(reads, max_cov=3, preferred_source_ids=None, bridging=False) == {1, 3, 5, 7}
    # bridging cannot add anything here: the slice already saturates cov 3
    assert readselection(reads, max_cov=3, preferred_source_ids=None, bridging=True) == {1, 3, 5, 7}


def test_selection2():
    reads = string_to_readset(
        """
      1111
         111
         1  111
         1     11
        1      11
    """
    )
    assert readselection(reads, max_cov=4, preferred_source_ids=None, bridging=False) == {0, 1, 2, 3}


def test_components_of_readselection():
    reads = string_to_readset(
        """
      111
         000
      00
          00
       1   1
    """
    )
    assert readselection(reads, max_cov=2, preferred_source_ids=None, bridging=False) == {0, 1, 2, 3}
    # with bridging, read 4 connects the two components and wins over 2/3
    assert readselection(reads, max_cov=2, preferred_source_ids=None, bridging=True) == {0, 1, 4}


def test_selection_with_preferred_sources():
    readset = string_to_readset(
        """
      1        1
    """,
        source_id=3,
    )
    more_reads = string_to_readset(
        """
      1111
         111
            1111
    """,
        source_id=1,
    )
    for read in more_reads:
        readset.add(read)

    assert readselection(readset, max_cov=2, preferred_source_ids=None, bridging=True) == {1, 2, 3}
    # preferring source 3 pulls in the long sparse read first
    assert readselection(readset, max_cov=2, preferred_source_ids={3}, bridging=True) == {0, 1, 3}
