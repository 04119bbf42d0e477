"""
Pedigree data-model behavior and recombination-event extraction,
mirroring the reference's tests/test_pedigree.py expectations
(reference: whatshap/pedigree.py find_recombination, src/pedigree.cpp).
"""

from whatshap_tpu.core import NumericSampleIds, Pedigree, PhredGenotypeLikelihoods
from whatshap_tpu.pedigree import RecombinationEvent, find_recombination
from whatshap_tpu.testhelpers import canonic_index_list_to_biallelic_gt_list


def test_pedigree_no_gls():
    ped = Pedigree(NumericSampleIds())
    gts_a = canonic_index_list_to_biallelic_gt_list([0, 1, 0, 2])
    gts_b = canonic_index_list_to_biallelic_gt_list([1, 2, 2, 0])
    ped.add_individual("sample1", gts_a)
    assert len(ped) == 1
    assert ped.variant_count == 4
    ped.add_individual("sample5", gts_b)
    assert len(ped) == 2
    assert ped.variant_count == 4
    for i in range(ped.variant_count):
        assert ped.genotype("sample1", i) == gts_a[i]
        assert ped.genotype_likelihoods("sample1", i) is None
        assert ped.genotype("sample5", i) == gts_b[i]
        assert ped.genotype_likelihoods("sample5", i) is None


def test_pedigree_with_gls():
    ped = Pedigree(NumericSampleIds())
    gts_a = canonic_index_list_to_biallelic_gt_list([0, 1, 0, 2])
    gls_a = [
        PhredGenotypeLikelihoods([0, 1, 2]),
        PhredGenotypeLikelihoods([215, 81, 147]),
        PhredGenotypeLikelihoods([199, 49, 253]),
        PhredGenotypeLikelihoods([167, 200, 163]),
    ]
    gts_b = canonic_index_list_to_biallelic_gt_list([1, 2, 2, 0])
    gls_b = [
        PhredGenotypeLikelihoods([184, 71, 233]),
        PhredGenotypeLikelihoods([65, 32, 87]),
        PhredGenotypeLikelihoods([28, 215, 131]),
        PhredGenotypeLikelihoods([98, 250, 137]),
    ]
    ped.add_individual("sample1", gts_a, gls_a)
    ped.add_individual("sample5", gts_b, gls_b)
    assert len(ped) == 2
    assert ped.variant_count == 4
    for i in range(ped.variant_count):
        assert ped.genotype("sample1", i) == gts_a[i]
        assert list(ped.genotype_likelihoods("sample1", i)) == list(gls_a[i])
        assert ped.genotype("sample5", i) == gts_b[i]
        assert list(ped.genotype_likelihoods("sample5", i)) == list(gls_b[i])


def test_find_recombination():
    transmission_vector = [0, 0, 1, 1, 0]
    positions = [5303, 5432, 8307, 9000, 9500]
    recombcost = [0, 3, 3, 1, 1]
    components = {p: 5303 for p in positions}
    events = find_recombination(transmission_vector, components, positions, recombcost)
    assert events == [
        RecombinationEvent(
            position1=5432,
            position2=8307,
            transmitted_hap_father1=0,
            transmitted_hap_father2=1,
            transmitted_hap_mother1=0,
            transmitted_hap_mother2=0,
            recombination_cost=3,
        ),
        RecombinationEvent(
            position1=9000,
            position2=9500,
            transmitted_hap_father1=1,
            transmitted_hap_father2=0,
            transmitted_hap_mother1=0,
            transmitted_hap_mother2=0,
            recombination_cost=1,
        ),
    ]
