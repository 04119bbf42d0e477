"""
Turn the chromosome-wise ref/read k-mer pair counts emitted by
`whatshap learn` into a phred-score cost table for the kmerald aligner
(behavior parity with whatshap/phred_scores.py: probability of each
(ref-kmer, read-kmer) pair across the genome with epsilon pseudocounts for
unseen pairs, emitted as -10*log10(p), plus one sentinel row per ref-kmer
with key -5 carrying the epsilon score).
"""

import argparse
import csv
import math
from collections import defaultdict
from pathlib import Path


def phred(inputfile, outputfile, epsilon_value, kmer_size):
    counts = defaultdict(int)
    seen_comb = defaultdict(int)
    comb_count = defaultdict(int)
    probabilities = {}
    k = int(kmer_size)
    total_comb = float(4**k)
    epsilon = float(epsilon_value)
    path = Path(inputfile)
    for file in path.glob("*.txt"):
        with open(file, "r") as counts_file:
            reader = csv.reader(counts_file, delimiter="\t")
            for line in reader:
                ref = line[1]
                read = line[2]
                count = int(line[3])
                counts[(ref, read)] += count

    for key in counts:
        seen_comb[key[0]] += 1
        comb_count[key[0]] += counts[key]

    with open(outputfile, "w") as writer:
        for s in counts:
            denom = comb_count[s[0]] + (total_comb - seen_comb[s[0]]) * epsilon
            probability = counts[s] / denom
            e_probability = epsilon / denom
            phred_score = -10 * math.log10(float(probability))
            e_phred_score = -10 * math.log10(float(e_probability))
            if s[0] not in probabilities:
                probabilities[s[0]] = 1
                print(s[0], -5, e_phred_score, sep="\t", file=writer)
            print(s[0], s[1], phred_score, sep="\t", file=writer)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "-i",
        "--inputfile",
        type=str,
        required=True,
        help="Folder containing ref-read kmer pair counts from whatshap learn",
    )
    parser.add_argument(
        "-o",
        "--outputfile",
        type=str,
        required=True,
        help="Output table of phred scores",
    )
    parser.add_argument(
        "-e",
        "--epsilon_value",
        type=str,
        required=True,
        help="Pseudocount value for unobserved kmer pairs",
    )
    parser.add_argument("-k", "--kmer_size", type=str, required=True, help="kmer length")
    args = parser.parse_args()
    phred(args.inputfile, args.outputfile, args.epsilon_value, args.kmer_size)


if __name__ == "__main__":
    main()
