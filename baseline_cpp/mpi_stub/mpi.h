/* Minimal single-rank MPI stub.
 *
 * Lets the reference C++ implementation build and run as one process on this
 * image (which ships libmpi.so but no MPI headers), so bench.py can measure a
 * real same-algorithm CPU baseline.  All collectives degenerate to memcpy /
 * no-ops, which is exactly MPI semantics at comm size 1.
 */
#ifndef FRIES_TPU_MPI_STUB_H
#define FRIES_TPU_MPI_STUB_H

#include <stddef.h>
#include <stdint.h>
#include <string.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef int MPI_Comm;
typedef int MPI_Datatype;
typedef int MPI_Op;

#define MPI_COMM_WORLD 0
#define MPI_SUCCESS 0
#define MPI_IN_PLACE ((void *)(-1))
#define MPI_DATATYPE_NULL 0

#define MPI_DOUBLE 1
#define MPI_INT 2
#define MPI_UNSIGNED 3
#define MPI_UINT8_T 4
#define MPI_UINT16_T 5
#define MPI_UINT32_T 6
#define MPI_UINT64_T 7
#define MPI_LONG_LONG 8

static inline size_t mpi_stub_size(MPI_Datatype t) {
    switch (t) {
        case MPI_DOUBLE: return sizeof(double);
        case MPI_INT: return sizeof(int);
        case MPI_UNSIGNED: return sizeof(unsigned int);
        case MPI_UINT8_T: return 1;
        case MPI_UINT16_T: return 2;
        case MPI_UINT32_T: return 4;
        case MPI_UINT64_T: return 8;
        case MPI_LONG_LONG: return sizeof(long long);
        default: return 1;
    }
}

static inline int MPI_Init(int *argc, char ***argv) { (void)argc; (void)argv; return 0; }
static inline int MPI_Finalize(void) { return 0; }
static inline int MPI_Comm_size(MPI_Comm c, int *s) { (void)c; *s = 1; return 0; }
static inline int MPI_Comm_rank(MPI_Comm c, int *r) { (void)c; *r = 0; return 0; }
static inline int MPI_Bcast(void *b, int n, MPI_Datatype t, int root, MPI_Comm c) {
    (void)b; (void)n; (void)t; (void)root; (void)c; return 0;
}

static inline int mpi_stub_copy(const void *src, void *dst, int n, MPI_Datatype t) {
    if (src != MPI_IN_PLACE && src != dst && src && dst)
        memcpy(dst, src, (size_t)n * mpi_stub_size(t));
    return 0;
}

static inline int MPI_Allgather(const void *sb, int sc, MPI_Datatype st, void *rb,
                                int rc, MPI_Datatype rt, MPI_Comm c) {
    (void)rc; (void)rt; (void)c;
    return mpi_stub_copy(sb, rb, sc, st);
}
static inline int MPI_Allgatherv(const void *sb, int sc, MPI_Datatype st, void *rb,
                                 const int *rcs, const int *displs, MPI_Datatype rt,
                                 MPI_Comm c) {
    (void)c; (void)rt;
    if (sb == MPI_IN_PLACE) return 0;
    char *dst = (char *)rb + (size_t)displs[0] * mpi_stub_size(st);
    (void)rcs;
    return mpi_stub_copy(sb, dst, sc, st);
}
static inline int MPI_Alltoall(const void *sb, int sc, MPI_Datatype st, void *rb,
                               int rc, MPI_Datatype rt, MPI_Comm c) {
    (void)rc; (void)rt; (void)c;
    return mpi_stub_copy(sb, rb, sc, st);
}
static inline int MPI_Alltoallv(const void *sb, const int *scs, const int *sdispls,
                                MPI_Datatype st, void *rb, const int *rcs,
                                const int *rdispls, MPI_Datatype rt, MPI_Comm c) {
    (void)rcs; (void)rt; (void)c;
    const char *src = (const char *)sb + (size_t)sdispls[0] * mpi_stub_size(st);
    char *dst = (char *)rb + (size_t)rdispls[0] * mpi_stub_size(st);
    if (src != dst) memcpy(dst, src, (size_t)scs[0] * mpi_stub_size(st));
    return 0;
}
static inline int MPI_Scatter(const void *sb, int sc, MPI_Datatype st, void *rb,
                              int rc, MPI_Datatype rt, int root, MPI_Comm c) {
    (void)rc; (void)rt; (void)root; (void)c;
    return mpi_stub_copy(sb, rb, sc, st);
}
static inline int MPI_Gather(const void *sb, int sc, MPI_Datatype st, void *rb,
                             int rc, MPI_Datatype rt, int root, MPI_Comm c) {
    (void)rc; (void)rt; (void)root; (void)c;
    return mpi_stub_copy(sb, rb, sc, st);
}

#ifdef __cplusplus
}
#endif

#endif /* FRIES_TPU_MPI_STUB_H */
