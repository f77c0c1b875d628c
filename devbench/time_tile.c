/* Uninstrumented per-stage timing of the native per-tile codec on a
 * real bench tile (dumped by devbench/prof_tile.sh's Python step).
 * Reports ms/tile per stage at the production build flags, so the
 * host pipeline's single-core budget is attributable stage by stage.
 *
 * Build: gcc -O3 -march=native -o /tmp/time_tile devbench/time_tile.c \
 *        ako_tpu/runtime/native/akort.c -lm
 */
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <time.h>

size_t akort_tile_encode_block(const uint8_t *, int32_t, int32_t, int32_t,
                               int32_t, int32_t, int32_t, int32_t,
                               const int32_t *, const int32_t *, size_t,
                               uint8_t *, size_t, int32_t *);
int32_t akort_tile_decode_block(const uint8_t *, size_t, size_t, size_t,
                                int32_t, int32_t, int32_t, int32_t, int32_t,
                                int32_t, uint8_t *);
void akort_u8_to_planes(const uint8_t *, int32_t, int32_t, int32_t, int32_t,
                        int32_t, int16_t *);
void akort_planes_to_u8(const int16_t *, int32_t, int32_t, int32_t, int32_t,
                        uint8_t *);
int32_t akort_tile_lift(const int16_t *, int32_t, int32_t, int32_t, int32_t,
                        int32_t, const int32_t *, const int32_t *, int16_t *,
                        size_t);
int32_t akort_tile_unlift(const int16_t *, size_t, int32_t, int32_t, int32_t,
                          int32_t, int32_t, int16_t *);
size_t akort_kagari_encode(const void *, size_t, void *, size_t);
size_t akort_kagari_decode(size_t, const void *, size_t, int16_t *, size_t);

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

static double now_ms(void)
{
	struct timespec ts;
	clock_gettime(CLOCK_MONOTONIC, &ts);
	return ts.tv_sec * 1e3 + ts.tv_nsec / 1e6;
}

#define TIME(label, reps, stmt)                                          \
	do {                                                             \
		double t0 = now_ms();                                    \
		for (int i = 0; i < (reps); i++) {                       \
			stmt;                                            \
		}                                                        \
		printf("%-16s %8.4f ms/tile\n", label,                   \
		       (now_ms() - t0) / (reps));                        \
	} while (0)

int main(int argc, char **argv)
{
	const int reps = argc > 1 ? atoi(argv[1]) : 400;
	const int32_t w = 128, h = 128, ch = 4;
	const size_t count = 65560;
	const int32_t wavelet = 0, wrap = 0, color = 3;
	size_t tile_n, qs_n, gs_n;
	uint8_t *tile = load("/tmp/prof_tile.bin", &tile_n);
	int32_t *qs = load("/tmp/prof_qs.bin", &qs_n);
	int32_t *gs = load("/tmp/prof_gs.bin", &gs_n);
	const size_t area = (size_t)w * h;
	int16_t *planes = malloc(area * ch * 2);
	int16_t *stream = malloc(count * 2);
	int16_t *values = malloc(count * 2 + 64);
	int16_t *planes2 = malloc(area * ch * 2);
	uint8_t *pixels = malloc(tile_n);
	const size_t cap = count * 2 + 4096;
	uint8_t *payload = malloc(cap);
	int32_t rc = 0;
	size_t n = 0;

	TIME("u8_to_planes", reps,
	     akort_u8_to_planes(tile, w, h, ch, color, 0, planes));
	TIME("tile_lift", reps,
	     akort_tile_lift(planes, w, h, ch, wavelet, wrap, qs, gs, stream,
	                     count));
	TIME("kagari_encode", reps,
	     n = akort_kagari_encode(stream, count * 2, payload, cap));
	TIME("kagari_decode", reps,
	     akort_kagari_decode(count, payload, n, values, count * 2));
	TIME("tile_unlift", reps,
	     akort_tile_unlift(values, count, w, h, ch, wavelet, wrap,
	                       planes2));
	TIME("planes_to_u8", reps,
	     akort_planes_to_u8(planes2, w, h, ch, color, pixels));
	TIME("encode_block", reps,
	     akort_tile_encode_block(tile, w, h, ch, wavelet, wrap, color, 0,
	                             qs, gs, count, payload, cap, &rc));
	TIME("decode_block", reps,
	     akort_tile_decode_block(payload, n, count, count * 2, w, h, ch,
	                             wavelet, wrap, color, pixels));
	printf("payload %zu bytes rc=%d pixels[0]=%d\n", n, rc, pixels[0]);
	return 0;
}
