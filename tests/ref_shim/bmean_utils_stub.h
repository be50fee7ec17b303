// Minimal stand-in for the BMEAN submodule's utils.h (empty in this
// reference snapshot) — ONLY the three symbols the reference's DBG
// translation units use (reference: src/DBG.h:7, src/DBG.cpp:21,30,34;
// src/correctionDBG.cpp:79-80):
//
//   * the `kmer` integer typedef,
//   * str2num: 2-bit encode A=0 C=1 G=2 T=3 (the mapping is forced by
//     DBG.cpp's own arithmetic: getNeighbours builds successor k-mers
//     as str2num(f)<<2 | i and names them via concatNucR, which maps
//     i = 0,1,2,3 to A,C,G,T — src/DBG.cpp:5-16,30-31),
//   * kmer2str: its inverse.
//
// uint64_t suffices: every k-mer these units encode has length
// <= merSize (the pipeline caps merSize at 15 -> 30 bits).
#pragma once
#include <cstdint>
#include <string>

typedef uint64_t kmer;

inline kmer str2num(const std::string& s) {
    kmer v = 0;
    for (char c : s) {
        v <<= 2;
        switch (c) {
            case 'A': case 'a': break;
            case 'C': case 'c': v += 1; break;
            case 'G': case 'g': v += 2; break;
            default: v += 3; break;
        }
    }
    return v;
}

inline std::string kmer2str(kmer v, unsigned k) {
    static const char* NUC = "ACGT";
    std::string s(k, 'A');
    for (unsigned i = 0; i < k; i++) {
        s[k - 1 - i] = NUC[v & 3];
        v >>= 2;
    }
    return s;
}
