/* gprof driver for the native per-tile codec hot path: loops
 * akort_tile_encode_block / akort_tile_decode_block on a real bench
 * tile (dumped by the caller — see devbench/prof_tile.sh) so the flat
 * profile shows where the host pipeline's per-tile milliseconds go.
 *
 * Build (from repo root):
 *   gcc -O2 -pg -o /tmp/prof_tile devbench/prof_tile.c \
 *       ako_tpu/runtime/native/akort.c -lm
 * Run: /tmp/prof_tile <reps>  (cwd must hold /tmp/prof_*.bin dumps)
 * Then: gprof /tmp/prof_tile gmon.out | head -40
 */
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

size_t akort_tile_encode_block(const uint8_t *, int32_t, int32_t, int32_t,
                               int32_t, int32_t, int32_t, int32_t,
                               const int32_t *, const int32_t *, size_t,
                               uint8_t *, size_t, int32_t *);
int32_t akort_tile_decode_block(const uint8_t *, size_t, size_t, size_t,
                                int32_t, int32_t, int32_t, int32_t, int32_t,
                                int32_t, uint8_t *);

static void *load(const char *path, size_t *size_out)
{
	FILE *f = fopen(path, "rb");
	if (!f) {
		perror(path);
		exit(1);
	}
	fseek(f, 0, SEEK_END);
	long n = ftell(f);
	fseek(f, 0, SEEK_SET);
	void *buf = malloc((size_t)n);
	if (fread(buf, 1, (size_t)n, f) != (size_t)n)
		exit(1);
	fclose(f);
	*size_out = (size_t)n;
	return buf;
}

int main(int argc, char **argv)
{
	const int reps = argc > 1 ? atoi(argv[1]) : 200;
	const int32_t w = 128, h = 128, ch = 4;
	const size_t count = 65560; /* tile_data_size(128,128)*4/2 */
	const int32_t wavelet = 0, wrap = 0, color = 3;
	size_t tile_n, qs_n, gs_n;
	uint8_t *tile = load("/tmp/prof_tile.bin", &tile_n);
	int32_t *qs = load("/tmp/prof_qs.bin", &qs_n);
	int32_t *gs = load("/tmp/prof_gs.bin", &gs_n);
	if (tile_n != (size_t)(w * h * ch)) {
		fprintf(stderr, "bad tile dump size %zu\n", tile_n);
		return 1;
	}
	const size_t cap = count * 2 + 4096;
	uint8_t *payload = malloc(cap);
	uint8_t *pixels = malloc(tile_n);
	int32_t rc = 0;
	size_t n = 0;
	for (int i = 0; i < reps; i++)
		n = akort_tile_encode_block(tile, w, h, ch, wavelet, wrap,
		                            color, 0, qs, gs, count, payload,
		                            cap, &rc);
	if (n == 0) {
		fprintf(stderr, "encode failed rc=%d\n", rc);
		return 1;
	}
	for (int i = 0; i < reps; i++)
		rc = akort_tile_decode_block(payload, n, count, count * 2, w,
		                             h, ch, wavelet, wrap, color,
		                             pixels);
	if (rc != 0) {
		fprintf(stderr, "decode failed rc=%d\n", rc);
		return 1;
	}
	printf("payload %zu bytes, pixels[0]=%d, reps=%d\n", n, pixels[0],
	       reps);
	free(tile);
	free(qs);
	free(gs);
	free(payload);
	free(pixels);
	return 0;
}
